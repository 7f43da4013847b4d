"""Pallas TPU kernel for DefTet's per-pixel top-``knum`` face selection.

TPU-native replacement for the selection pass of ``deftet_sparse_render``
(reference CUDA per-pixel insertion k-buffer,
``kaolin/csrc/render/mesh/deftet_cuda.cu:32-238``). The XLA route
(``lax.approx_max_k`` over a materialized (pixels, faces) score matrix)
moves the full score matrix through HBM and costs ~20 ms at
(4096 px, 10k faces, k=30); this kernel streams face chunks from VMEM and
never materializes scores.

Design: pixels live in lanes — each grid step owns a (8, 128) tile of
1024 pixels — and the kernel keeps a ``KB``-row sorted k-buffer of
(depth, face id) register pairs per pixel. Faces arrive in chunks of
``KB`` on the leading axis; each chunk is scored ((KB, 8, 128) barycentric
math, identical op-for-op to the XLA path so results are bit-equal),
bitonic-sorted along the leading axis by the compound key
(depth desc, face id asc) — a total order, so tie handling equals
``lax.top_k``'s lowest-index rule — and merged with the running buffer by
a keep-top-half bitonic merge (reverse + elementwise max + half-clean).
All compare-exchanges are static leading-axis vreg selects: no lane or
sublane shuffles, no cross-lane reductions, no scalar branching.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['deftet_topk_pallas']

TILE_G = 8        # sublane groups of 128 pixels per tile (1024 px)
BIG = 0x7fffffff


def _ce(zs, ids, a, b):
    """Compare-exchange: the (depth desc, id asc)-greater pair ends at
    position ``a``."""
    za, ia = zs[a], ids[a]
    zb, ib = zs[b], ids[b]
    gt = (za > zb) | ((za == zb) & (ia < ib))
    zs[a] = jnp.where(gt, za, zb)
    ids[a] = jnp.where(gt, ia, ib)
    zs[b] = jnp.where(gt, zb, za)
    ids[b] = jnp.where(gt, ib, ia)


def _bitonic_sort_desc(zs, ids):
    """In-place bitonic sort of the python-list network, descending by
    (depth, -id)."""
    n = len(zs)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                l = i ^ j
                if l > i:
                    if (i & k) == 0:
                        _ce(zs, ids, i, l)      # descending run
                    else:
                        _ce(zs, ids, l, i)      # ascending run
            j //= 2
        k *= 2


def _merge_top(bufz, bufi, zs, ids):
    """Keep-top-half bitonic merge of two descending sorted lists of equal
    length; the buffer retains the overall top-``len``."""
    n = len(bufz)
    for i in range(n):
        za, ia = bufz[i], bufi[i]
        zb, ib = zs[n - 1 - i], ids[n - 1 - i]
        gt = (za > zb) | ((za == zb) & (ia < ib))
        bufz[i] = jnp.where(gt, za, zb)
        bufi[i] = jnp.where(gt, ia, ib)
    j = n // 2
    while j >= 1:                               # half-clean the bitonic top
        for i in range(n):
            l = i ^ j
            if l > i:
                _ce(bufz, bufi, i, l)
        j //= 2


def _topk_kernel(pc_ref, rr_ref, z_ref, img_ref, bbox_ref, out_ref, *,
                 kb, num_faces, eps):
    dtype = z_ref.dtype
    px = pc_ref[0, 0]                           # (TILE_G, 128)
    py = pc_ref[0, 1]
    rmin = rr_ref[0, 0]
    rmax = rr_ref[0, 1]
    neg = jnp.full(px.shape, -jnp.inf, dtype)

    def chunk_body(c, carry):
        bufz = list(carry[:kb])
        bufi = list(carry[kb:])
        f0 = c * kb
        bb = bbox_ref[0, pl.ds(f0, kb), :]      # (kb, 4)
        img = img_ref[0, pl.ds(f0, kb), :]      # (kb, 6)
        fz = z_ref[0, pl.ds(f0, kb), :]         # (kb, 3)

        pxb = px[None, :, :]
        pyb = py[None, :, :]
        in_bbox = ((pxb >= bb[:, 0][:, None, None])
                   & (pxb < bb[:, 2][:, None, None])
                   & (pyb >= bb[:, 1][:, None, None])
                   & (pyb < bb[:, 3][:, None, None]))
        ax = img[:, 0][:, None, None] - pxb
        ay = img[:, 1][:, None, None] - pyb
        bx = img[:, 2][:, None, None] - pxb
        by = img[:, 3][:, None, None] - pyb
        cx = img[:, 4][:, None, None] - pxb
        cy = img[:, 5][:, None, None] - pyb
        w0 = bx * cy - by * cx
        w1 = cx * ay - cy * ax
        w2 = ax * by - ay * bx
        norm = w0 + w1 + w2
        norm = norm + eps * jnp.sign(norm)
        w0 = w0 / norm
        w1 = w1 / norm
        w2 = w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
        depth = (w0 * fz[:, 0][:, None, None]
                 + w1 * fz[:, 1][:, None, None]
                 + w2 * fz[:, 2][:, None, None])
        in_range = (depth > rmin[None, :, :]) & (depth < rmax[None, :, :])
        score = jnp.where(in_bbox & inside & in_range, depth, -jnp.inf)

        zs = [score[i] for i in range(kb)]
        ids = [jnp.where(score[i] > -jnp.inf, jnp.int32(f0 + i),
                         jnp.int32(BIG)) for i in range(kb)]
        _bitonic_sort_desc(zs, ids)
        _merge_top(bufz, bufi, zs, ids)
        return tuple(bufz) + tuple(bufi)

    init = tuple(neg for _ in range(kb)) \
        + tuple(jnp.full(px.shape, BIG, jnp.int32) for _ in range(kb))
    n_chunks = num_faces // kb
    carry = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    for i in range(kb):
        out_ref[0, i] = jnp.where(carry[i] > -jnp.inf, carry[kb + i], -1)


@functools.partial(jax.jit, static_argnames=('knum', 'eps', 'interpret'))
def deftet_topk_pallas(pixel_coords, render_ranges, face_vertices_z,
                       face_vertices_image, valid_mask, knum, eps,
                       interpret=False):
    """Per-pixel top-``knum`` face ids by (depth desc, id asc).

    Same contract as the XLA ``_select_topk`` with ``tie_exact=True``
    (``lax.top_k`` tie rule). Requires ``knum <= 64``.

    Args:
        pixel_coords: (B, P, 2).
        render_ranges: (B, P, 2) (min, max) depth.
        face_vertices_z: (B, F, 3).
        face_vertices_image: (B, F, 3, 2).
        valid_mask: (B, F) bool.
        knum (int): faces kept per pixel.

    Returns:
        (B, P, knum) int32 face ids, -1 for empty slots.
    """
    B, P, _ = pixel_coords.shape
    F = face_vertices_image.shape[1]
    dtype = pixel_coords.dtype
    assert knum <= 64, knum
    kb = 32 if knum <= 32 else 64

    fmin = jnp.min(face_vertices_image, axis=2)          # (B, F, 2)
    fmax = jnp.max(face_vertices_image, axis=2)
    fmin = jnp.where(valid_mask[..., None], fmin, jnp.inf)
    bbox = jnp.concatenate([fmin, fmax], axis=-1)        # (B,F,4) x0 y0 x1 y1

    fpad = (-F) % kb
    if fpad:
        bbox = jnp.concatenate(
            [bbox, jnp.tile(jnp.asarray([jnp.inf, jnp.inf, -jnp.inf,
                                         -jnp.inf], dtype), (B, fpad, 1))],
            axis=1)
        face_vertices_z = jnp.pad(face_vertices_z, ((0, 0), (0, fpad),
                                                    (0, 0)))
        face_vertices_image = jnp.pad(face_vertices_image,
                                      ((0, 0), (0, fpad), (0, 0), (0, 0)))
    Fp = F + fpad

    ppad = (-P) % (TILE_G * 128)
    pc = jnp.pad(pixel_coords, ((0, 0), (0, ppad), (0, 0)),
                 constant_values=jnp.inf)
    rr = jnp.pad(render_ranges, ((0, 0), (0, ppad), (0, 0)))
    Pp = P + ppad
    G = Pp // 128
    # pixels-in-lanes packing: (B, 2, G, 128)
    pc = pc.transpose(0, 2, 1).reshape(B, 2, G, 128)
    rr = rr.transpose(0, 2, 1).reshape(B, 2, G, 128)
    img_flat = face_vertices_image.reshape(B, Fp, 6)

    grid = (B, G // TILE_G)
    kernel = functools.partial(_topk_kernel, kb=kb, num_faces=Fp,
                               eps=float(eps))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, TILE_G, 128), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE_G, 128), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 6), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kb, TILE_G, 128),
                               lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, kb, G, 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=B * Pp * Fp * 40 * 2,
            bytes_accessed=B * (Fp * 13 * 4 + Pp * (4 + kb) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pc, rr, face_vertices_z, img_flat, bbox)
    # (B, kb, G, 128) -> (B, P, knum)
    sel = out.transpose(0, 2, 3, 1).reshape(B, Pp, kb)[:, :P, :knum]
    return sel
