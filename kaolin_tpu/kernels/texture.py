"""Pallas TPU kernel for 2D texture sampling (``grid_sample``).

TPU has no hardware gather: XLA lowers per-pixel texture fetches to
~8 ns/element scalar loops, which makes bilinear sampling (4 taps x C
channels) the dominant cost of textured DIB-R rendering. This kernel
replaces every gather with MXU matmuls in a PIXELS-IN-LANES layout:

- coordinates stream as (B, P/128, 128) lane groups (fully packed
  (8, 128) tiles — a (P, 1) pixel-major layout wastes 128x physical
  HBM bandwidth to tile padding and was measured I/O-bound at
  1.4 ms/frame before any compute);
- per 128-pixel group, y interpolation builds a transposed weight
  matrix wyT (H, 128) (two nonzeros per column) and one matmul
  texT (C*W, H) @ wyT mixes the two texture rows of every pixel for
  all channels at once;
- x interpolation multiplies by the analogous wxT tiled per channel
  and reduces over the W sublanes — pixels stay in lanes end to end.

Restricted to textures with H <= 128 and W <= 128 lanes (typical DIB-R
texture maps); the XLA gather path remains the fallback and the
cross-implementation reference.

Reference behavior: ``torch.nn.functional.grid_sample`` with
``align_corners=False``, ``padding_mode='border'`` (the reference's
``texture_mapping``, ``kaolin/render/mesh/utils.py:23``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['grid_sample_pallas', 'grid_sample_coords']

RB = 8         # 128-pixel lane groups per block (= 1024 pixels)
_HI = jax.lax.Precision.HIGHEST


def _weightsT(coord, size, mode, dtype, with_grad=False):
    """Transposed interpolation weights for one lane group.

    ``coord`` (1, 128) -> (size, 128) with (1 - w) at row floor(c) and
    w at row min(floor(c)+1, size-1) (one-hot for nearest mode); with
    ``with_grad`` also returns d/dcoord (-1/+1 at the two taps).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, 128), 0)
    if mode == 'nearest':
        cn = jnp.round(coord).astype(jnp.int32)
        one = (rows == cn).astype(dtype)
        if with_grad:
            return one, jnp.zeros_like(one)
        return one
    c0f = jnp.floor(coord)
    w = coord - c0f
    c0 = c0f.astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, size - 1)
    val = (jnp.where(rows == c0, 1. - w, 0.)
           + jnp.where(rows == c1, w, 0.)).astype(dtype)
    if with_grad:
        dval = ((rows == c1).astype(dtype) - (rows == c0).astype(dtype))
        return val, dval
    return val


def _sample_kernel(tex_ref, ix_ref, iy_ref, out_ref, *, H, W, C, mode):
    tex = tex_ref[0]                                    # (C*W, H)
    dtype = tex.dtype
    for s in range(RB):
        x = ix_ref[0, s:s + 1, :]                       # (1, 128)
        y = iy_ref[0, s:s + 1, :]
        wyT = _weightsT(y, H, mode, dtype)              # (H, 128)
        wxT = _weightsT(x, W, mode, dtype)              # (W, 128)
        rowsT = jax.lax.dot_general(
            tex, wyT, (((1,), (0,)), ((), ())), precision=_HI)
        for c in range(C):
            out_ref[0, c, s:s + 1, :] = jnp.sum(
                rowsT[c * W:(c + 1) * W] * wxT, axis=0, keepdims=True)


def _tex_T(input_maps):
    """(B, C, H, W) -> (B, C*W, H): row c*W+x holds texel column x of
    channel c across y."""
    B, C, H, W = input_maps.shape
    return jnp.transpose(input_maps, (0, 1, 3, 2)).reshape(B, C * W, H)


def _pack(coords, P_pad):
    """(B, P) -> (B, (P+pad)/128, 128) packed lane groups."""
    B, P = coords.shape
    if P_pad != P:
        coords = jnp.pad(coords, ((0, 0), (0, P_pad - P)))
    return coords.reshape(B, P_pad // 128, 128)


@functools.partial(jax.jit, static_argnames=('mode', 'interpret'))
def grid_sample_pallas(input_maps, ix, iy, mode='bilinear',
                       interpret=False):
    """Samples (B, C, H, W) maps at unnormalized, border-clipped sampler
    coordinates ``ix``/``iy`` (B, P). H, W <= 128. Returns (B, P, C)."""
    B, C, H, W = input_maps.shape
    P = ix.shape[1]
    assert H <= 128 and W <= 128, (H, W)
    Pp = P + (-P) % (RB * 128)
    ixg = _pack(ix, Pp)
    iyg = _pack(iy, Pp)
    tex = _tex_T(input_maps)
    kernel = functools.partial(_sample_kernel, H=H, W=W, C=C, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, Pp // (RB * 128)),
        in_specs=[
            pl.BlockSpec((1, C * W, H), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, RB, 128), lambda b, p: (b, 0, p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Pp // 128, 128),
                                       input_maps.dtype),
        interpret=interpret,
    )(tex, ixg, iyg)
    return jnp.transpose(out.reshape(B, C, Pp)[:, :, :P], (0, 2, 1))


def _sample_bwd_kernel(tex_ref, ix_ref, iy_ref, cot_ref, dtex_ref, dix_ref,
                       diy_ref, *, H, W, C, mode):
    """Gradients w.r.t. texture and sampler coords, gather-free.

    d/dtex contracts (cot * wx) against wy over the 128 pixel lanes
    (one matmul per group, accumulated across the revisited (C*W, H)
    output); d/dix and d/diy replace the weight matrices by their
    coordinate derivatives (identically zero for nearest mode).
    """
    p = pl.program_id(1)
    tex = tex_ref[0]
    dtype = tex.dtype
    acc = jnp.zeros((tex.shape[0], H), dtype)
    for s in range(RB):
        x = ix_ref[0, s:s + 1, :]
        y = iy_ref[0, s:s + 1, :]
        wyT, dwyT = _weightsT(y, H, mode, dtype, with_grad=True)
        wxT, dwxT = _weightsT(x, W, mode, dtype, with_grad=True)
        cot_bigT = jnp.concatenate(
            [jnp.broadcast_to(cot_ref[0, c, s:s + 1, :], (W, 128))
             for c in range(C)], axis=0)                # (C*W, 128)
        wx_bigT = jnp.concatenate([wxT] * C, axis=0)
        G = cot_bigT * wx_bigT
        acc = acc + jax.lax.dot_general(
            G, wyT, (((1,), (1,)), ((), ())), precision=_HI)  # (C*W, H)
        if mode == 'nearest':
            dix_ref[0, s:s + 1, :] = jnp.zeros((1, 128), dtype)
            diy_ref[0, s:s + 1, :] = jnp.zeros((1, 128), dtype)
        else:
            rowsT = jax.lax.dot_general(
                tex, wyT, (((1,), (0,)), ((), ())), precision=_HI)
            rows_dyT = jax.lax.dot_general(
                tex, dwyT, (((1,), (0,)), ((), ())), precision=_HI)
            dwx_bigT = jnp.concatenate([dwxT] * C, axis=0)
            dix_ref[0, s:s + 1, :] = jnp.sum(
                rowsT * dwx_bigT * cot_bigT, axis=0, keepdims=True)
            diy_ref[0, s:s + 1, :] = jnp.sum(
                rows_dyT * wx_bigT * cot_bigT, axis=0, keepdims=True)

    @pl.when(p == 0)
    def _():
        dtex_ref[0] = jnp.zeros_like(dtex_ref[0])
    dtex_ref[0] = dtex_ref[0] + acc


@functools.partial(jax.jit, static_argnames=('mode', 'interpret'))
def _grid_sample_bwd_pallas(input_maps, ix, iy, cot, mode='bilinear',
                            interpret=False):
    B, C, H, W = input_maps.shape
    P = ix.shape[1]
    Pp = P + (-P) % (RB * 128)
    ixg = _pack(ix, Pp)
    iyg = _pack(iy, Pp)
    cotT = jnp.transpose(cot, (0, 2, 1))                # (B, C, P)
    if Pp != P:
        cotT = jnp.pad(cotT, ((0, 0), (0, 0), (0, Pp - P)))
    cotg = cotT.reshape(B, C, Pp // 128, 128)
    tex = _tex_T(input_maps)
    kernel = functools.partial(_sample_bwd_kernel, H=H, W=W, C=C,
                               mode=mode)
    G128 = Pp // 128
    dtex, dix, diy = pl.pallas_call(
        kernel,
        grid=(B, Pp // (RB * 128)),
        in_specs=[
            pl.BlockSpec((1, C * W, H), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, RB, 128), lambda b, p: (b, 0, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C * W, H), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 128), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C * W, H), input_maps.dtype),
            jax.ShapeDtypeStruct((B, G128, 128), input_maps.dtype),
            jax.ShapeDtypeStruct((B, G128, 128), input_maps.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(tex, ixg, iyg, cotg)
    dmaps = jnp.transpose(dtex.reshape(B, C, W, H), (0, 1, 3, 2))
    return (dmaps, dix.reshape(B, Pp)[:, :P], diy.reshape(B, Pp)[:, :P])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def grid_sample_coords(input_maps, ix, iy, mode='bilinear',
                       interpret=False):
    """Differentiable sampling at unnormalized coords (custom VJP over
    the forward/backward Pallas kernels)."""
    return grid_sample_pallas(input_maps, ix, iy, mode=mode,
                              interpret=interpret)


def _gs_fwd(input_maps, ix, iy, mode, interpret):
    out = grid_sample_pallas(input_maps, ix, iy, mode=mode,
                             interpret=interpret)
    return out, (input_maps, ix, iy)


def _gs_bwd(mode, interpret, res, cot):
    input_maps, ix, iy = res
    dmaps, dix, diy = _grid_sample_bwd_pallas(input_maps, ix, iy, cot,
                                              mode=mode,
                                              interpret=interpret)
    return dmaps, dix, diy


grid_sample_coords.defvjp(_gs_fwd, _gs_bwd)
