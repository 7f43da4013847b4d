"""DefTet volumetric renderer: all ray-face intersections per pixel,
sorted near-to-far, up to ``knum``.

TPU-native re-design of ``kaolin/render/mesh/deftet.py:101-417`` (CUDA
``kaolin/csrc/render/mesh/deftet_cuda.cu``). Follows the reference's
*naive* (documented test-anchor) semantics: the first ``knum`` faces by
depth (the CUDA kernel's insertion order differs only when truncating).
Selection is a non-differentiable ``lax.top_k`` over per-pixel face
depths, computed in pixel chunks; feature interpolation is recomputed
differentiably from the selected faces (the reference's Cramer k1/k2/k3
formulation), so autodiff reproduces the analytic backward.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['deftet_sparse_render']


@functools.partial(jax.jit,
                   static_argnames=('knum', 'eps', 'chunk', 'tie_exact',
                                    'backend'))
def _select_topk(pixel_coords, render_ranges, face_vertices_z,
                 face_vertices_image, valid_mask, knum, eps, chunk=1024,
                 tie_exact=False, backend=None):
    """Per-pixel top-knum face indices by descending depth (non-diff)."""
    B, P, _ = pixel_coords.shape
    F = face_vertices_z.shape[1]

    if backend is None:
        # The Pallas kernel stages the whole face table (z + image +
        # bbox columns, ~52 B/face after f32 padding) into VMEM per grid
        # step; beyond ~8 MB of faces that exceeds the ~16 MB VMEM
        # budget and Mosaic refuses to compile — fall back to the
        # chunked XLA path, which streams faces and handles any F.
        faces_vmem_ok = F * 52 <= 8 * 1024 * 1024
        backend = ('pallas' if jax.default_backend() == 'tpu'
                   and knum <= 64 and faces_vmem_ok else 'xla')
    if backend in ('pallas', 'pallas_interpret'):
        # streams face chunks through a sorted in-register k-buffer —
        # exact lax.top_k (lowest-index tie) semantics, ~5x the
        # approx_max_k route at (4k px, 10k faces, k=30)
        from ...kernels.deftet_topk import deftet_topk_pallas
        return deftet_topk_pallas(
            pixel_coords, render_ranges, face_vertices_z,
            face_vertices_image, valid_mask, int(knum), float(eps),
            interpret=(backend == 'pallas_interpret'))

    fmin = jnp.min(face_vertices_image, axis=2)       # (B, F, 2)
    fmax = jnp.max(face_vertices_image, axis=2)

    pad = (-P) % chunk
    pc = jnp.pad(pixel_coords, ((0, 0), (0, pad), (0, 0)))
    rr = jnp.pad(render_ranges, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (P + pad) // chunk
    pc = pc.reshape(B, n_chunks, chunk, 2).transpose(1, 0, 2, 3)
    rr = rr.reshape(B, n_chunks, chunk, 2).transpose(1, 0, 2, 3)

    img = face_vertices_image                          # (B, F, 3, 2)

    def one_chunk(carry, inp):
        pcoords, rranges = inp                         # (B, chunk, 2)
        px = pcoords[..., 0][:, :, None]               # (B, chunk, 1)
        py = pcoords[..., 1][:, :, None]
        in_bbox = ((px >= fmin[:, None, :, 0]) & (px < fmax[:, None, :, 0])
                   & (py >= fmin[:, None, :, 1]) & (py < fmax[:, None, :, 1])
                   & valid_mask[:, None, :])
        ax = img[:, None, :, 0, 0] - px
        ay = img[:, None, :, 0, 1] - py
        bx = img[:, None, :, 1, 0] - px
        by = img[:, None, :, 1, 1] - py
        cx = img[:, None, :, 2, 0] - px
        cy = img[:, None, :, 2, 1] - py
        w0 = bx * cy - by * cx
        w1 = cx * ay - cy * ax
        w2 = ax * by - ay * bx
        norm = w0 + w1 + w2
        norm = norm + eps * jnp.sign(norm)
        w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
        depth = (w0 * face_vertices_z[:, None, :, 0]
                 + w1 * face_vertices_z[:, None, :, 1]
                 + w2 * face_vertices_z[:, None, :, 2])
        in_range = ((depth > rranges[..., 0][:, :, None])
                    & (depth < rranges[..., 1][:, :, None]))
        score = jnp.where(in_bbox & inside & in_range, depth, -jnp.inf)
        if score.shape[-1] < knum:
            # fewer faces than the k-buffer depth: pad so top_k is legal;
            # padded slots carry -inf and mask to -1 below
            score = jnp.pad(score,
                            ((0, 0), (0, 0), (0, knum - score.shape[-1])),
                            constant_values=-jnp.inf)
        if jax.default_backend() == 'tpu' and not tie_exact:
            # exact VALUES at recall_target=1.0 and ~2x faster than
            # lax.top_k on this backend (PartialReduce lowering).
            # CAVEAT: on exactly-tied depths (coplanar/duplicated
            # faces) the surviving INDEX is unspecified, unlike
            # top_k's lowest-index rule — pass tie_exact=True for
            # bit-parity with the CPU path when ties can straddle the
            # knum boundary.
            top_val, top_idx = jax.lax.approx_max_k(
                score, knum, recall_target=1.0)        # (B, chunk, knum)
        else:
            top_val, top_idx = jax.lax.top_k(score, knum)
        sel = jnp.where(top_val > -jnp.inf, top_idx, -1).astype(jnp.int32)
        return carry, sel

    _, sels = jax.lax.scan(one_chunk, 0, (pc, rr))
    sels = sels.transpose(1, 0, 2, 3).reshape(B, -1, knum)
    return sels[:, :P]


def deftet_sparse_render(pixel_coords, render_ranges, face_vertices_z,
                         face_vertices_image, face_features, knum=300,
                         valid_faces=None, eps=1e-8, tie_exact=False,
                         backend=None):
    r"""Renders all ray-face intersections per pixel sorted by depth.

    Behavior matches the reference ``kaolin.render.mesh.deftet_sparse_render``
    (``kaolin/render/mesh/deftet.py:338``; top-knum-by-depth semantics of
    the naive test anchor).

    Args:
        pixel_coords: (batch_size, num_pixels, 2) image coords in [-1, 1].
        render_ranges: (batch_size, num_pixels, 2) (min_depth, max_depth),
            typically [-inf, 0] for camera-space z.
        face_vertices_z: (batch_size, num_faces, 3) camera-space z
            (negative forward, nearest = greatest).
        face_vertices_image: (batch_size, num_faces, 3, 2).
        face_features: (batch_size, num_faces, 3, feat_dim) or list.
        knum (int): max faces per pixel.
        valid_faces: optional (batch_size, num_faces) bool.
        eps: barycentric normalization epsilon.
        tie_exact (bool): force ``lax.top_k`` (lowest-index rule on
            exactly tied depths) on TPU too; by default TPU uses the
            ~2x-faster ``approx_max_k(recall_target=1.0)`` whose
            choice among EXACTLY tied depths at the knum boundary is
            unspecified (values are exact either way).

    Returns:
        (interpolated_features (B, P, knum, feat_dim) — or tuple —
        and face_idx (B, P, knum) int32, -1 for empty slots).
    """
    is_multi = isinstance(face_features, (list, tuple))
    _face_features = jnp.concatenate(face_features, axis=-1) if is_multi \
        else face_features
    B, P, _ = pixel_coords.shape
    F = face_vertices_z.shape[1]
    D = _face_features.shape[-1]
    if valid_faces is None:
        valid_mask = jnp.ones((B, F), bool)
    else:
        valid_mask = valid_faces

    sel = _select_topk(jax.lax.stop_gradient(pixel_coords),
                       jax.lax.stop_gradient(render_ranges),
                       jax.lax.stop_gradient(face_vertices_z),
                       jax.lax.stop_gradient(face_vertices_image),
                       valid_mask, int(knum), float(eps),
                       tie_exact=bool(tie_exact), backend=backend)

    # differentiable interpolation on selected faces
    # (deftet.py:203-257 k1/k2/k3 formulation)
    covered = sel >= 0
    safe = jnp.maximum(sel, 0).reshape(B, -1)          # (B, P*knum)
    img_flat = face_vertices_image.reshape(B, F, 6)
    g = jnp.take_along_axis(img_flat, safe[..., None], axis=1
                            ).reshape(B, P, knum, 6)
    ax, ay = g[..., 0], g[..., 1]
    m = g[..., 2] - g[..., 0]
    p = g[..., 3] - g[..., 1]
    n = g[..., 4] - g[..., 0]
    q = g[..., 5] - g[..., 1]
    k3 = m * q - n * p
    s = pixel_coords[:, :, None, 0] - ax
    t = pixel_coords[:, :, None, 1] - ay
    k1 = s * q - n * t
    k2 = m * t - s * p
    norm_eps = eps * jnp.sign(k3)
    w1 = k1 / (k3 + norm_eps)
    w2 = k2 / (k3 + norm_eps)
    w0 = 1. - w1 - w2
    weights = jnp.stack([w0, w1, w2], axis=-1)         # (B, P, knum, 3)
    feat = jnp.take_along_axis(
        _face_features.reshape(B, F, 3 * D), safe[..., None], axis=1
    ).reshape(B, P, knum, 3, D)
    out = jnp.sum(feat * weights[..., None], axis=-2)
    out = jnp.where(covered[..., None], out, 0.)

    if is_multi:
        outs = []
        cur = 0
        for f in face_features:
            outs.append(out[..., cur:cur + f.shape[-1]])
            cur += f.shape[-1]
        out = tuple(outs)
    return out, sel
