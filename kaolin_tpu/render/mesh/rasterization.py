"""Differentiable z-buffer rasterization.

TPU-native re-design of the reference rasterizer
(``kaolin/render/mesh/rasterization.py:390``, CUDA kernels
``kaolin/csrc/render/mesh/rasterization_cuda.cu``). Two backends:

- ``'pallas'``: Pallas TPU kernel for the pixel/face z-buffer selection
  (:func:`kaolin_tpu.kernels.rasterize.rasterize_select_pallas`);
- ``'xla'``: pure-XLA ``lax.scan`` over face chunks (runs anywhere, used as
  the cross-implementation reference — the naive-vs-kernel test pattern of
  the reference, see SURVEY §4.3).

Face culling (``valid_faces``) is handled by masking face bboxes instead of
the reference's dynamic compaction (static shapes under ``jit``). The
barycentric weights and feature interpolation run as XLA epilogue ops; the
analytic backward (reference ``rasterization_cuda.cu:239-402``) is a
``jax.custom_vjp`` using deterministic ``segment_sum`` scatters instead of
atomics.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['rasterize']


def _pixel_coords(height, width, multiplier, dtype, row_start=0,
                  total_height=None):
    """Pixel-center coordinates; y-up image space, scaled by ``multiplier``.

    Matches ``rasterization_cuda.cu:85-86``:
    ``x0 = m/W*(2wx+1-W)``, ``y0 = m/H*(H-2hy-1)``.

    ``row_start``/``total_height`` render a horizontal slab of a larger
    image — the pixel-sharding hook for multi-chip rendering (pixel rows
    split across the mesh 'pix' axis, SURVEY §2.3).
    """
    if total_height is None:
        total_height = height
    wx = jnp.arange(width, dtype=dtype)
    hy = jnp.asarray(row_start, dtype) + jnp.arange(height, dtype=dtype)
    x0 = (multiplier / width) * (2. * wx + 1. - width)
    y0 = (multiplier / total_height) * (total_height - 2. * hy - 1.)
    return x0, y0


def _barycentric(px, py, img, eps):
    """Edge-function barycentrics with signed-eps normalization.

    ``img``: (..., 6) = (ax, ay, bx, by, cx, cy); ``px``/``py`` broadcast
    against its leading dims. Matches ``rasterization_cuda.cu:131-145``.
    """
    ax = img[..., 0] - px
    ay = img[..., 1] - py
    bx = img[..., 2] - px
    by = img[..., 3] - py
    cx = img[..., 4] - px
    cy = img[..., 5] - py
    w0 = bx * cy - by * cx
    w1 = cx * ay - cy * ax
    w2 = ax * by - ay * bx
    norm = w0 + w1 + w2
    norm = norm + jnp.copysign(jnp.asarray(eps, norm.dtype), norm)
    return w0 / norm, w1 / norm, w2 / norm


def _select_faces_xla(face_vertices_z, img_flat, bboxes, height, width,
                      multiplier, eps, row_start=0, total_height=None,
                      chunk=32):
    """Pure-XLA winner-face selection: scan over face chunks carrying the
    per-pixel (max z, face index) state. Ties keep the lowest face index,
    matching the sequential CUDA scan (``rasterization_cuda.cu:162-169``)."""
    B, F, _ = face_vertices_z.shape
    dtype = face_vertices_z.dtype
    x0, y0 = _pixel_coords(height, width, multiplier, dtype,
                           row_start, total_height)
    px = x0[None, :]                    # (1, W)
    py = y0[:, None]                    # (H, 1)

    pad = (-F) % chunk
    if pad:
        img_flat = jnp.pad(img_flat, ((0, 0), (0, pad), (0, 0)))
        bboxes = jnp.pad(bboxes, ((0, 0), (0, pad), (0, 0)),
                         constant_values=jnp.inf)
        face_vertices_z = jnp.pad(face_vertices_z, ((0, 0), (0, pad), (0, 0)))
    num_chunks = (F + pad) // chunk

    def one_batch(fz, img, bbox):
        fz_c = fz.reshape(num_chunks, chunk, 3)
        img_c = img.reshape(num_chunks, chunk, 6)
        bbox_c = bbox.reshape(num_chunks, chunk, 4)

        def body(carry, inp):
            zbuf, idx = carry
            fz_k, img_k, bbox_k, base = inp
            pxb = px[None]              # (1, 1, W)
            pyb = py[None]              # (1, H, 1)
            hit = ((pxb >= bbox_k[:, 0, None, None])
                   & (pxb < bbox_k[:, 2, None, None])
                   & (pyb >= bbox_k[:, 1, None, None])
                   & (pyb < bbox_k[:, 3, None, None]))
            w0, w1, w2 = _barycentric(pxb, pyb, img_k[:, None, None, :], eps)
            inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
            z0 = (w0 * fz_k[:, 0, None, None] + w1 * fz_k[:, 1, None, None]
                  + w2 * fz_k[:, 2, None, None])
            z0 = jnp.where(hit & inside, z0, -jnp.inf)
            zmax = jnp.max(z0, axis=0)
            kidx = jnp.argmax(z0, axis=0).astype(jnp.int32) + base
            take = zmax > zbuf
            return (jnp.where(take, zmax, zbuf),
                    jnp.where(take, kidx, idx)), None

        init = (jnp.full((height, width), -jnp.inf, dtype),
                jnp.full((height, width), -1, jnp.int32))
        bases = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
        (zbuf, idx), _ = jax.lax.scan(body, init, (fz_c, img_c, bbox_c, bases))
        return zbuf, idx

    return jax.vmap(one_batch)(face_vertices_z, img_flat, bboxes)


def _rasterize_fwd_impl(height, width, multiplier, eps, backend,
                        total_height, face_vertices_z, face_vertices_image,
                        face_features, valid_mask, row_start):
    """Forward rasterization; returns (features, face_idx, weights).

    ``row_start`` (traced f32 scalar) and ``total_height`` (static) select
    a horizontal slab of a ``total_height`` x ``width`` image."""
    row_start = jnp.asarray(row_start, jnp.int32)
    B, F, _, _ = face_vertices_image.shape
    dtype = face_vertices_image.dtype
    img_scaled = face_vertices_image * multiplier
    img_flat = img_scaled.reshape(B, F, 6)
    bb_min = jnp.min(img_scaled, axis=2)
    bb_max = jnp.max(img_scaled, axis=2)
    bboxes = jnp.concatenate([bb_min, bb_max], axis=-1)
    if valid_mask is not None:
        # culled faces get an empty bbox: bbox test can never pass
        inf = jnp.asarray(jnp.inf, dtype)
        bboxes = jnp.where(valid_mask[..., None] > 0, bboxes,
                           jnp.stack([inf, inf, -inf, -inf])[None, None, :])

    feat_dim = face_features.shape[-1]
    # VMEM residency is bounded at any face count since the per-face
    # constants pack into one 128-lane table blocked over face segments
    # (kernels/rasterize.py F_SEG); the fused kernel only needs the
    # features to FIT the table's lanes — fall back to select + gather
    # epilogue for very wide features
    fused_ok = 14 + 3 * feat_dim <= 128
    if backend in ('pallas', 'pallas_interpret') and fused_ok:
        from ...kernels.rasterize import rasterize_interp_pallas
        interpolated, face_idx, weights = rasterize_interp_pallas(
            face_vertices_z, img_flat, bboxes,
            face_features.reshape(B, F, 3 * feat_dim), row_start,
            height=height, width=width, total_height=total_height,
            multiplier=float(multiplier), eps=float(eps),
            interpret=(backend == 'pallas_interpret'))
        return interpolated, face_idx, weights
    if backend in ('pallas', 'pallas_interpret'):
        from ...kernels.rasterize import rasterize_select_pallas
        _, face_idx = rasterize_select_pallas(
            face_vertices_z, img_flat, bboxes, row_start,
            height=height, width=width, total_height=total_height,
            multiplier=float(multiplier), eps=float(eps),
            interpret=(backend == 'pallas_interpret'))
    else:
        _, face_idx = _select_faces_xla(
            face_vertices_z, img_flat, bboxes, height, width, multiplier,
            eps, row_start, total_height)

    # epilogue: recompute the winner's weights (same formula => identical
    # values), interpolate features; uncovered pixels -> 0 / -1
    covered = face_idx >= 0
    safe_idx = jnp.maximum(face_idx, 0)
    x0, y0 = _pixel_coords(height, width, multiplier, dtype,
                           row_start, total_height)
    px = x0[None, None, :]
    py = y0[None, :, None]
    win_img = jnp.take_along_axis(
        img_flat, safe_idx.reshape(B, -1)[..., None], axis=1
    ).reshape(B, height, width, 6)
    w0, w1, w2 = _barycentric(px, py, win_img, eps)
    weights = jnp.stack([w0, w1, w2], axis=-1)
    weights = jnp.where(covered[..., None], weights, 0.)

    feat_dim = face_features.shape[-1]
    win_feat = jnp.take_along_axis(
        face_features.reshape(B, F, 3 * feat_dim),
        safe_idx.reshape(B, -1)[..., None], axis=1
    ).reshape(B, height, width, 3, feat_dim)
    interpolated = jnp.einsum('bhwk,bhwkd->bhwd', weights, win_feat)
    interpolated = jnp.where(covered[..., None], interpolated, 0.)
    return interpolated, face_idx, weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _rasterize(height, width, multiplier, eps, backend, total_height,
               face_vertices_z, face_vertices_image, face_features,
               valid_mask, row_start):
    out = _rasterize_fwd_impl(height, width, multiplier, eps, backend,
                              total_height, face_vertices_z,
                              face_vertices_image, face_features,
                              valid_mask, row_start)
    return out[0], out[1]


def _rasterize_fwd(height, width, multiplier, eps, backend, total_height,
                   face_vertices_z, face_vertices_image, face_features,
                   valid_mask, row_start):
    interpolated, face_idx, weights = _rasterize_fwd_impl(
        height, width, multiplier, eps, backend, total_height,
        face_vertices_z, face_vertices_image, face_features, valid_mask,
        row_start)
    residuals = (face_idx, weights, face_vertices_image, face_features,
                 row_start)
    return (interpolated, face_idx), residuals


def _rasterize_bwd(height, width, multiplier, eps, backend, total_height,
                   residuals, grads):
    """Analytic backward, matching ``rasterization_cuda.cu:239-402``.

    Per covered pixel: Cramer-solved closed-form dw/d(6 image verts)
    (with the ``k3 + copysign(eps, k3)`` guard), chained with the feature
    deltas; scatter-add to faces via deterministic ``segment_sum``.
    Gradients are w.r.t. the *unscaled* image verts (the reference saves
    the unscaled tensor for backward).
    """
    grad_interpolated, _ = grads
    face_idx, weights, face_vertices_image, face_features, row_start = \
        residuals
    B, F, _, _ = face_vertices_image.shape
    _, H, W, D = grad_interpolated.shape
    dtype = face_vertices_image.dtype

    if backend in ('pallas', 'pallas_interpret') and H % 8 == 0 \
            and W % 128 == 0:
        from ...kernels.rasterize_bwd import rasterize_backward_pallas
        grad_img, grad_feat = rasterize_backward_pallas(
            grad_interpolated, face_idx, weights, face_vertices_image,
            face_features, row_start, height=H, width=W,
            total_height=total_height, multiplier=multiplier, eps=eps,
            interpret=(backend == 'pallas_interpret'))
        return (jnp.zeros((B, F, 3), dtype), grad_img, grad_feat,
                jnp.zeros((B, F), dtype), jnp.zeros((), jnp.float32))

    covered = face_idx >= 0
    safe_idx = jnp.maximum(face_idx, 0)
    flat_idx = safe_idx.reshape(B, -1)

    img_flat = face_vertices_image.reshape(B, F, 6)
    win_img = jnp.take_along_axis(img_flat, flat_idx[..., None], axis=1
                                  ).reshape(B, H, W, 6)
    win_feat = jnp.take_along_axis(
        face_features.reshape(B, F, 3 * D), flat_idx[..., None], axis=1
    ).reshape(B, H, W, 3, D)

    g = jnp.where(covered[..., None], grad_interpolated, 0.)

    # grad of face_features: w_i * g_d  (rasterization_cuda.cu:272-285)
    grad_feat_pix = weights[..., :, None] * g[..., None, :]   # (B,H,W,3,D)

    # grad of image verts (rasterization_cuda.cu:288-398)
    ax, ay = win_img[..., 0], win_img[..., 1]
    bx, by = win_img[..., 2], win_img[..., 3]
    cx, cy = win_img[..., 4], win_img[..., 5]
    aw, bw, cw = weights[..., 0], weights[..., 1], weights[..., 2]
    x0 = aw * ax + bw * bx + cw * cx
    y0 = aw * ay + bw * by + cw * cy
    m = bx - ax
    p = by - ay
    n = cx - ax
    q = cy - ay
    s = x0 - ax
    t = y0 - ay
    k1 = s * q - n * t
    k2 = m * t - s * p
    k3 = m * q - n * p
    k3 = k3 + jnp.copysign(jnp.asarray(eps, dtype), k3)

    dk1dm = jnp.zeros_like(k1)
    dk1dn = -t
    dk1dp = jnp.zeros_like(k1)
    dk1dq = s
    dk1ds = q
    dk1dt = -n
    dk2dm = t
    dk2dn = jnp.zeros_like(k2)
    dk2dp = -s
    dk2dq = jnp.zeros_like(k2)
    dk2ds = -p
    dk2dt = m
    dk3dm = q
    dk3dn = -p
    dk3dp = -n
    dk3dq = m

    dw1dm = dk1dm * k3 - dk3dm * k1
    dw1dn = dk1dn * k3 - dk3dn * k1
    dw1dp = dk1dp * k3 - dk3dp * k1
    dw1dq = dk1dq * k3 - dk3dq * k1
    dw1ds = dk1ds * k3
    dw1dt = dk1dt * k3
    dw2dm = dk2dm * k3 - dk3dm * k2
    dw2dn = dk2dn * k3 - dk3dn * k2
    dw2dp = dk2dp * k3 - dk3dp * k2
    dw2dq = dk2dq * k3 - dk3dq * k2
    dw2ds = dk2ds * k3
    dw2dt = dk2dt * k3

    dw1dax = -(dw1dm + dw1dn + dw1ds)
    dw1day = -(dw1dp + dw1dq + dw1dt)
    dw2dax = -(dw2dm + dw2dn + dw2ds)
    dw2day = -(dw2dp + dw2dq + dw2dt)

    c0 = win_feat[..., 0, :]
    c1 = win_feat[..., 1, :]
    c2 = win_feat[..., 2, :]
    # sum over features of dldI_d * (c1-c0)_d and (c2-c0)_d
    g1 = jnp.sum(g * (c1 - c0), axis=-1) / (k3 * k3)
    g2 = jnp.sum(g * (c2 - c0), axis=-1) / (k3 * k3)

    grad_img_pix = jnp.stack([
        g1 * dw1dax + g2 * dw2dax,
        g1 * dw1day + g2 * dw2day,
        g1 * dw1dm + g2 * dw2dm,
        g1 * dw1dp + g2 * dw2dp,
        g1 * dw1dn + g2 * dw2dn,
        g1 * dw1dq + g2 * dw2dq,
    ], axis=-1)                                               # (B,H,W,6)
    grad_img_pix = jnp.where(covered[..., None], grad_img_pix, 0.)
    grad_feat_pix = jnp.where(covered[..., None, None], grad_feat_pix, 0.)

    # deterministic scatter to faces: segment ids = b * F + face_idx
    boffs = jnp.arange(B, dtype=jnp.int32)[:, None] * F
    seg = (flat_idx.astype(jnp.int32) + boffs).reshape(-1)
    seg = jnp.where(covered.reshape(-1), seg, B * F)
    grad_img = jax.ops.segment_sum(
        grad_img_pix.reshape(-1, 6), seg, num_segments=B * F + 1)[:-1]
    grad_feat = jax.ops.segment_sum(
        grad_feat_pix.reshape(-1, 3 * D), seg, num_segments=B * F + 1)[:-1]

    return (jnp.zeros((B, F, 3), dtype),
            grad_img.reshape(B, F, 3, 2),
            grad_feat.reshape(B, F, 3, D),
            jnp.zeros((B, F), dtype),
            jnp.zeros((), jnp.float32))


_rasterize.defvjp(_rasterize_fwd, _rasterize_bwd)


def rasterize(height, width, face_vertices_z, face_vertices_image,
              face_features, valid_faces=None, multiplier=None, eps=None,
              backend='auto', row_start=0, total_height=None):
    r"""Fully differentiable rasterization of triangle meshes with
    per-vertex-per-face features into feature images.

    Behavior matches the reference ``kaolin.render.mesh.rasterize``
    (``kaolin/render/mesh/rasterization.py:390``).

    Args:
        height, width (int): output image size.
        face_vertices_z: (batch_size, num_faces, 3) camera-space z
            (negative forward; the *max* interpolated z wins the z-test).
        face_vertices_image: (batch_size, num_faces, 3, 2) image-plane
            coords in [-1, 1].
        face_features: (batch_size, num_faces, 3, feat_dim) or a
            list/tuple of such (concatenated then re-split).
        valid_faces: optional (batch_size, num_faces) bool mask.
        multiplier (float): coordinate scaling for numerics. Default 1000.
        eps (float): barycentric normalization epsilon. Default 1e-8.
        backend: 'pallas' (TPU kernel), 'xla' (portable scan), or 'auto'
            (pallas on TPU, xla otherwise).

    Returns:
        (interpolated_features (B, H, W, feat_dim) — or tuple if
        ``face_features`` was a list — and face_idx (B, H, W) int32,
        -1 where uncovered).
    """
    if multiplier is None:
        multiplier = 1000
    if eps is None:
        eps = 1e-8
    if backend == 'auto':
        backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'

    is_multi = isinstance(face_features, (list, tuple))
    _face_features = jnp.concatenate(face_features, axis=-1) if is_multi \
        else face_features
    if valid_faces is None:
        valid_mask = jnp.ones(face_vertices_z.shape[:2],
                              dtype=face_vertices_z.dtype)
    else:
        valid_mask = valid_faces.astype(face_vertices_z.dtype)
    if total_height is None:
        total_height = height
    image_features, face_idx = _rasterize(
        height, width, float(multiplier), float(eps), backend,
        int(total_height), face_vertices_z, face_vertices_image,
        _face_features, valid_mask, jnp.asarray(row_start, jnp.float32))
    if is_multi:
        outs = []
        cur = 0
        for f in face_features:
            outs.append(image_features[..., cur:cur + f.shape[-1]])
            cur += f.shape[-1]
        image_features = tuple(outs)
    return image_features, face_idx
