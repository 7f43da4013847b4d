"""Pallas TPU kernel for the rasterization backward pass.

Replaces the XLA ``segment_sum`` scatter backward
(``kaolin_tpu/render/mesh/rasterization.py _rasterize_bwd``; reference
``rasterization_cuda.cu:239-402``) with band accumulation: the same
face-sorting + per-band chunk ranges as the forward kernel
(:mod:`.rasterize`), but each (band, face-chunk) step reduces the
Cramer-form vertex/feature gradients over the band's pixels (masked to
pixels the face actually won) and accumulates into revisited per-face
output blocks — deterministic, no scatters, no atomics.

Pixel coordinates never appear: following the reference, the backward
reconstructs the pixel position from the saved barycentric weights.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import _band_face_ranges, FACE_CHUNK, TILE_H

__all__ = ['rasterize_backward_pallas']


def _bwd_kernel(start_ref, end_ref, img_ref, ids_ref, feat_ref, fidx_ref,
                w_ref, grad_ref, gimg_ref, gfeat_ref, *, num_feats, eps):
    b = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        gimg_ref[...] = jnp.zeros_like(gimg_ref)
        gfeat_ref[...] = jnp.zeros_like(gfeat_ref)

    fidx = fidx_ref[0, :, :]                       # (th, w) int32
    aw = w_ref[0, 0, :, :]
    bw = w_ref[0, 1, :, :]
    cw = w_ref[0, 2, :, :]

    def chunk_body(c, _):
        f0 = c * FACE_CHUNK
        img = img_ref[0, pl.ds(f0, FACE_CHUNK), :]         # (8, 6) unscaled
        ids = ids_ref[0, pl.ds(f0, FACE_CHUNK), 0]         # (8,)
        feats = feat_ref[0, pl.ds(f0, FACE_CHUNK), :]      # (8, 3*D)

        won = fidx[None, :, :] == ids[:, None, None]       # (8, th, w)

        ax = img[:, 0][:, None, None]
        ay = img[:, 1][:, None, None]
        bx = img[:, 2][:, None, None]
        by = img[:, 3][:, None, None]
        cx = img[:, 4][:, None, None]
        cy = img[:, 5][:, None, None]
        # reconstruct the pixel from the weights
        # (rasterization_cuda.cu:298-303)
        x0 = aw[None] * ax + bw[None] * bx + cw[None] * cx
        y0 = aw[None] * ay + bw[None] * by + cw[None] * cy
        m = bx - ax
        p = by - ay
        n = cx - ax
        q = cy - ay
        s = x0 - ax
        t = y0 - ay
        k1 = s * q - n * t
        k2 = m * t - s * p
        k3 = m * q - n * p
        k3 = k3 + jnp.copysign(eps, k3)

        # derivative table (rasterization_cuda.cu:324-374)
        dk1dn = -t
        dk1dq = s
        dk1ds = q
        dk1dt = -n
        dk2dm = t
        dk2dp = -s
        dk2ds = -p
        dk2dt = m
        dk3dm = q
        dk3dn = -p
        dk3dp = -n
        dk3dq = m

        dw1dm = -dk3dm * k1
        dw1dn = dk1dn * k3 - dk3dn * k1
        dw1dp = -dk3dp * k1
        dw1dq = dk1dq * k3 - dk3dq * k1
        dw1ds = dk1ds * k3
        dw1dt = dk1dt * k3
        dw2dm = dk2dm * k3 - dk3dm * k2
        dw2dn = -dk3dn * k2
        dw2dp = dk2dp * k3 - dk3dp * k2
        dw2dq = -dk3dq * k2
        dw2ds = dk2ds * k3
        dw2dt = dk2dt * k3

        dw1dax = -(dw1dm + dw1dn + dw1ds)
        dw1day = -(dw1dp + dw1dq + dw1dt)
        dw2dax = -(dw2dm + dw2dn + dw2ds)
        dw2day = -(dw2dp + dw2dq + dw2dt)

        inv_k3sq = 1. / (k3 * k3)
        # g1 = sum_d grad_d * (c1 - c0)_d, g2 with (c2 - c0)
        g1 = jnp.zeros_like(k3)
        g2 = jnp.zeros_like(k3)
        for d in range(num_feats):
            gd = grad_ref[0, d, :, :][None]               # (1, th, w)
            c0 = feats[:, d][:, None, None]
            c1 = feats[:, num_feats + d][:, None, None]
            c2 = feats[:, 2 * num_feats + d][:, None, None]
            g1 = g1 + gd * (c1 - c0)
            g2 = g2 + gd * (c2 - c0)
        g1 = jnp.where(won, g1 * inv_k3sq, 0.)
        g2 = jnp.where(won, g2 * inv_k3sq, 0.)

        def red(x):
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        comps = [
            red(g1 * dw1dax + g2 * dw2dax),
            red(g1 * dw1day + g2 * dw2day),
            red(g1 * dw1dm + g2 * dw2dm),
            red(g1 * dw1dp + g2 * dw2dp),
            red(g1 * dw1dn + g2 * dw2dn),
            red(g1 * dw1dq + g2 * dw2dq),
        ]
        delta = jnp.concatenate(comps, axis=1)             # (8, 6)
        gimg_ref[0, pl.ds(f0, FACE_CHUNK), :] = \
            gimg_ref[0, pl.ds(f0, FACE_CHUNK), :] + delta

        # feature grads: w_i * grad_d reduced over won pixels
        fcomps = []
        ws = (aw, bw, cw)
        for i in range(3):
            wi = jnp.where(won, ws[i][None], 0.)
            for d in range(num_feats):
                gd = grad_ref[0, d, :, :][None]
                fcomps.append(red(wi * gd))
        fdelta = jnp.concatenate(fcomps, axis=1)           # (8, 3*D)
        gfeat_ref[0, pl.ds(f0, FACE_CHUNK), :] = \
            gfeat_ref[0, pl.ds(f0, FACE_CHUNK), :] + fdelta
        return 0

    jax.lax.fori_loop(start_ref[b, r], end_ref[b, r], chunk_body, 0)


@functools.partial(jax.jit, static_argnames=('height', 'width',
                                             'total_height', 'multiplier',
                                             'eps', 'interpret'))
def rasterize_backward_pallas(grad_interpolated, face_idx, weights,
                              face_vertices_image, face_features,
                              row_start=0, *, height, width,
                              total_height=None, multiplier, eps,
                              interpret=False):
    """Gradients of rasterization w.r.t. image verts and features.

    Args:
        grad_interpolated: (B, H, W, D) cotangent.
        face_idx: (B, H, W) int32 winner faces (-1 empty).
        weights: (B, H, W, 3) saved barycentric weights.
        face_vertices_image: (B, F, 3, 2) UNSCALED image verts.
        face_features: (B, F, 3, D).

    Returns:
        (grad_face_vertices_image (B, F, 3, 2),
        grad_face_features (B, F, 3, D)).
    """
    B, F, _, _ = face_vertices_image.shape
    D = face_features.shape[-1]
    dtype = face_vertices_image.dtype
    assert height % TILE_H == 0 and width % 128 == 0, (height, width)
    if total_height is None:
        total_height = height
    row_start = jnp.asarray(row_start, jnp.int32)

    # same spatial sort + band ranges as the forward kernel, computed on
    # the SCALED bboxes (coverage is a subset of the bbox)
    bb_min = jnp.min(face_vertices_image * multiplier, axis=2)
    bb_max = jnp.max(face_vertices_image * multiplier, axis=2)
    bboxes = jnp.concatenate([bb_min, bb_max], axis=-1)

    pad = (-F) % FACE_CHUNK
    Fp = F + pad
    if pad:
        empty = jnp.tile(
            jnp.asarray([jnp.inf, jnp.inf, -jnp.inf, -jnp.inf], dtype),
            (B, pad, 1))
        bboxes = jnp.concatenate([bboxes, empty], axis=1)
    order = jnp.argsort(-bboxes[..., 3], axis=1).astype(jnp.int32)
    bb_s = jnp.take_along_axis(bboxes, order[..., None], axis=1)
    img_flat = face_vertices_image.reshape(B, F, 6)
    if pad:
        img_flat = jnp.pad(img_flat, ((0, 0), (0, pad), (0, 0)))
    img_s = jnp.take_along_axis(img_flat, order[..., None], axis=1)
    feat_flat = face_features.reshape(B, F, 3 * D)
    if pad:
        feat_flat = jnp.pad(feat_flat, ((0, 0), (0, pad), (0, 0)))
    feat_s = jnp.take_along_axis(feat_flat, order[..., None], axis=1)

    start_c, end_c = _band_face_ranges(bb_s, height, float(multiplier),
                                       row_start, total_height)

    grad_t = jnp.transpose(grad_interpolated, (0, 3, 1, 2))   # (B, D, H, W)
    w_t = jnp.transpose(weights, (0, 3, 1, 2))                # (B, 3, H, W)

    kernel = functools.partial(_bwd_kernel, num_feats=D, eps=float(eps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, height // TILE_H),
        in_specs=[
            pl.BlockSpec((1, Fp, 6), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 1), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 3 * D), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_H, width),
                         lambda b, r, *_: (b, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TILE_H, width),
                         lambda b, r, *_: (b, 0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Fp, 6), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 3 * D), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    gimg_s, gfeat_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Fp, 6), dtype),
            jax.ShapeDtypeStruct((B, Fp, 3 * D), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(start_c, end_c, img_s, order[..., None], feat_s, face_idx, w_t,
      grad_t)

    inv = jnp.argsort(order, axis=1)
    gimg = jnp.take_along_axis(gimg_s, inv[..., None], axis=1)[:, :F]
    gfeat = jnp.take_along_axis(gfeat_s, inv[..., None], axis=1)[:, :F]
    return gimg.reshape(B, F, 3, 2), gfeat.reshape(B, F, 3, D)
