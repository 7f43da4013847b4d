"""Pallas TPU kernels for the DIB-R soft silhouette mask.

TPU-native re-design of ``kaolin/csrc/render/mesh/dibr_soft_mask_cuda.cu``.
Column-tiled pruning shared with the rasterizer kernels
(:func:`kaolin_tpu.kernels.rasterize._tile_face_ranges`): faces are sorted
by (column-tile segment, enlarged-bbox ymax); each 8-row band is processed
in 128-lane column tiles, and each tile runs three unconditional chunk
loops (own segment, left-neighbor segment, wide-face segment) over
scalar-prefetched [start, end) ranges. A per-face segment-id mask keeps
boundary chunks (visited by two segment loops) from double-processing a
(face, pixel) pair.

``knum`` semantics: the CUDA kernel records the first ``knum`` bbox-hits in
*face order*; these kernels record the first ``knum`` in *spatially sorted*
order. Whenever a pixel has at most ``knum`` bbox-hits (the regime the
reference documents as correct — knum "should be adapted to boxlen, to
avoid missing faces", ``kaolin/render/mesh/dibr.py:101-104``), the product
over hits is order-independent and results are identical to the reference.
The portable XLA path (``kaolin_tpu/render/mesh/dibr.py``) keeps exact
original-order truncation and is the golden-test reference; pass
``knum_exact=True`` (or call eagerly — a host probe then detects binding
and falls back automatically) to :func:`dibr_soft_mask` when truncation
order must match the reference bit-for-bit.

The backward accumulates per-face gradients across row bands by revisiting
one (F, 6) output block over the sequential grid — deterministic, no
atomics (vs the CUDA atomicAdd scatter, ``dibr_soft_mask_cuda.cu:299``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import (_tile_face_ranges, _pack_face_table,
                        FACE_CHUNK, TILE_H, CT_W, F_SEG)

__all__ = ['soft_mask_forward_pallas', 'soft_mask_backward_pallas']

_EPS = 1e-7  # dibr_soft_mask_cuda.cu:23


def _chunk_distances(px, py, img, econst, multiplier):
    """Min over 6 squared pixel-face distances + argmin type.

    ``img``: (8, 6) scaled verts; ``econst``: (8, 16) per-face edge
    constants [A, B, C, 1/(down+eps), down] per edge, precomputed by the
    XLA prepass (:func:`_edge_constants`) — ~27 tiny (8, 1) ops per
    chunk otherwise dominate the chunk's fixed cost on the VPU.
    ``px``/``py``: (th, w). Returns
    (dissquare, edgeid, edge_terms) of shape (8, th, w); ``edge_terms``
    is a per-edge list of (up, inv_down) reused by the backward. Matches
    ``dibr_soft_mask_cuda.cu:100-159``.

    Perf note: ``down`` is per-face, so one per-face reciprocal replaces
    the reference's three per-pixel divisions, and the foot-of-
    perpendicular point (x3, y3) is never materialized — the
    inside-segment test uses the algebraically equal-signed
    ``dot * (dot - down)`` where ``dot = (p - v1) . (v2 - v1)`` (the
    reference's ``direct = (x3-x1)(x3-x2)+(y3-y1)(y3-y2)`` equals
    ``dot*(dot-down)/down`` in exact arithmetic). Degenerate edges
    (``down == 0``) are forced outside (the eps-regularized reference
    formula classifies them outside for any off-origin edge).
    """
    bad = 4. * multiplier * multiplier
    pxb = px[None]
    pyb = py[None]
    pdis = []
    edge_terms = []
    for i in range(3):
        x1 = img[:, i * 2][:, None, None]
        y1 = img[:, i * 2 + 1][:, None, None]
        A = econst[:, i * 5 + 0][:, None, None]
        B = econst[:, i * 5 + 1][:, None, None]
        C = econst[:, i * 5 + 2][:, None, None]
        inv_down = econst[:, i * 5 + 3][:, None, None]
        down = econst[:, i * 5 + 4][:, None, None]
        up = A * pxb + B * pyb + C
        dot = A * (pyb - y1) - B * (pxb - x1)
        outside = (dot * (dot - down) > 0) | (down <= 0.)
        perp = up * up * inv_down
        pdis.append(jnp.where(outside, bad, perp))
        edge_terms.append((up, inv_down))
    for i in range(3):
        x1 = img[:, i * 2][:, None, None]
        y1 = img[:, i * 2 + 1][:, None, None]
        pdis.append((pxb - x1) ** 2 + (pyb - y1) ** 2)
    dissquare = pdis[0]
    edgeid = jnp.zeros_like(pdis[0], dtype=jnp.int32)
    for i in range(1, 6):
        smaller = pdis[i] < dissquare
        dissquare = jnp.where(smaller, pdis[i], dissquare)
        edgeid = jnp.where(smaller, i, edgeid)
    return dissquare, edgeid, edge_terms


def _hit_and_recorded(px, py, bbox, valid, uncovered, count, knum):
    """Per-chunk bbox hits + first-knum recording mask.

    ``valid``: (8, 1, 1) per-face segment mask. Returns
    (hit (8,th,w) bool, recorded (8,th,w) bool, new_count (th,w)).
    """
    pxb = px[None]
    pyb = py[None]
    hit = ((pxb >= bbox[:, 0][:, None, None])
           & (pxb < bbox[:, 2][:, None, None])
           & (pyb >= bbox[:, 1][:, None, None])
           & (pyb < bbox[:, 3][:, None, None])
           & valid & uncovered[None])
    hit_i = hit.astype(jnp.int32)
    # unrolled prefix sum over the 8 chunk sublanes (cumsum is not
    # supported by the Pallas TPU lowering)
    parts = []
    acc = jnp.zeros_like(hit_i[0])
    for i in range(FACE_CHUNK):
        acc = acc + hit_i[i]
        parts.append(acc)
    cum = jnp.stack(parts, axis=0)
    cum_before = count[None] + cum - hit_i
    recorded = hit & (cum_before < knum)
    return hit, recorded, count + cum[FACE_CHUNK - 1]


def _face_mask(face, seg, li, t):
    """(8, 1, 1) mask selecting faces of segment ``seg``; the neighbor
    loop (li == 1) additionally requires the face to reach tile ``t``.
    ``face``: the chunk's (8, 128) packed table rows (lane 26 = tile
    segment, lane 27 = tmax; stored as dtype, exact below 2**24)."""
    segf = face[:, 26].astype(jnp.int32)
    ok = segf == seg
    if li == 1:
        ok = ok & (face[:, 27].astype(jnp.int32) >= t)
    return ok[:, None, None]


def _sm_fwd_kernel(start_ref, end_ref, roff_ref, tbl_ref,
                   fidx_ref, mask_ref, *, height, width, total_height,
                   knum, sigmainv, multiplier, num_segs):
    """Packed face-table lanes: [0:6] scaled img verts, [6:22] edge
    constants, [22:26] enlarged bbox, [26] tile segment, [27] tmax.
    ``mask_ref`` carries the running (1 - prob) product across the face
    segments (grid dim 2, innermost: the block is revisited
    consecutively) and converts to the mask after the last segment.
    ``knum`` truncation counts reset per face segment — identical to
    the single-segment kernel whenever a pixel has fewer than knum
    bbox-hits per segment (the regime the reference documents as
    correct); when binding, MORE terms are recorded (closer to the
    un-truncated mask), and fwd/bwd use the same rule."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    sseg = pl.program_id(2)
    n_ct = width // CT_W
    dtype = mask_ref.dtype
    H = total_height
    row = (roff_ref[0] + r * TILE_H
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CT_W), 0))
    py = (multiplier / H) * (H - 2 * row - 1).astype(dtype)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CT_W), 1)
    zscale = sigmainv / multiplier / multiplier

    @pl.when(sseg == 0)
    def _():
        mask_ref[...] = jnp.ones_like(mask_ref)

    for t in range(n_ct):
        px = (multiplier / width) * (
            2 * (col0 + t * CT_W) + 1 - width).astype(dtype)
        uncovered = fidx_ref[0, :, t * CT_W:(t + 1) * CT_W] < 0

        def chunk_body(c, carry, seg, li, px=px, uncovered=uncovered, t=t):
            count, prod = carry
            f0 = c * FACE_CHUNK
            face = tbl_ref[0, pl.ds(f0, FACE_CHUNK), :]
            img = face[:, 0:6]
            econst = face[:, 6:22]
            bbox = face[:, 22:26]
            valid = _face_mask(face, seg, li, t)
            _, recorded, count = _hit_and_recorded(
                px, py, bbox, valid, uncovered, count, knum)
            dissquare, _, _ = _chunk_distances(px, py, img, econst,
                                               multiplier)
            z = dissquare * zscale
            prob = jnp.exp(-z)
            terms = jnp.where(recorded, 1. - prob, 1.)
            # unrolled product over the 8 chunk sublanes (reduce_prod is
            # not supported by the Pallas TPU lowering)
            for i in range(FACE_CHUNK):
                prod = prod * terms[i]
            return count, prod

        carry = (jnp.zeros((TILE_H, CT_W), jnp.int32),
                 jnp.ones((TILE_H, CT_W), dtype))
        segs = [(0, t), (2, n_ct)] if t == 0 else \
            [(0, t), (1, t - 1), (2, n_ct)]
        for li, seg in segs:
            idx = ((r * n_ct + t) * 3 + li) * num_segs + sseg
            carry = jax.lax.fori_loop(
                start_ref[b, idx], end_ref[b, idx],
                functools.partial(chunk_body, seg=seg, li=li), carry)
        _, prod = carry
        sl = slice(t * CT_W, (t + 1) * CT_W)
        mask_ref[0, :, sl] = mask_ref[0, :, sl] * prod

    @pl.when(sseg == num_segs - 1)
    def _():
        uncov = fidx_ref[0, :, :] < 0
        mask_ref[0, :, :] = jnp.where(uncov, 1. - mask_ref[0, :, :],
                                      jnp.asarray(1.0, dtype))


def _sm_bwd_kernel(start_ref, end_ref, roff_ref, tbl_ref,
                   fidx_ref, mask_ref, grad_in_ref, grad_ref, *, height,
                   width, total_height, knum, sigmainv, multiplier,
                   num_segs, num_bands):
    """Grid (B, S, bands), bands innermost: the (1, f_seg, 6) per-face
    grad block is revisited consecutively across bands and accumulates
    in VMEM. knum counts reset per face segment, mirroring the fwd."""
    b = pl.program_id(0)
    sseg = pl.program_id(1)
    r = pl.program_id(2)
    n_ct = width // CT_W
    dtype = grad_ref.dtype
    H = total_height
    row = (roff_ref[0] + r * TILE_H
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CT_W), 0))
    py = (multiplier / H) * (H - 2 * row - 1).astype(dtype)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CT_W), 1)
    zscale = sigmainv / multiplier / multiplier

    @pl.when(r == 0)
    def _():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    def tile_body(t, px, uncovered, allprob, dLdp):
      pxb = px[None]
      pyb = py[None]

      def chunk_body(c, count, seg, li):
        f0 = c * FACE_CHUNK
        face = tbl_ref[0, pl.ds(f0, FACE_CHUNK), :]
        img = face[:, 0:6]
        econst = face[:, 6:22]
        bbox = face[:, 22:26]
        valid = _face_mask(face, seg, li, t)
        _, recorded, count = _hit_and_recorded(
            px, py, bbox, valid, uncovered, count, knum)
        dissquare, edgeid, edge_terms = _chunk_distances(px, py, img, econst,
                                                         multiplier)
        prob = jnp.exp(-(dissquare * zscale))
        dLdz = (-1. * sigmainv * dLdp[None] * (1. - allprob[None])
                / (1. - prob + _EPS) * prob)
        dLdz = jnp.where(recorded, dLdz, 0.)

        # (8, 6) per-chunk-face gradient, reduced over the tile.
        # All intermediates stay 2D — 1D values crash the Mosaic
        # layout engine.
        def _reduce(x):
            # rows first: the 8 per-face row-folds then share one packed
            # lane tree instead of 8 separate ones
            return jnp.sum(jnp.sum(x, axis=1), axis=1,
                           keepdims=True) / multiplier   # (8, 1)

        comps = [jnp.zeros((FACE_CHUNK, 1), dtype) for _ in range(6)]
        # vertex-distance cases (dibr_soft_mask_cuda.cu:289-302)
        for v in range(3):
            x1 = img[:, v * 2][:, None, None]
            y1 = img[:, v * 2 + 1][:, None, None]
            m_v = jnp.where(edgeid == 3 + v, dLdz, 0.)
            comps[v * 2] = comps[v * 2] + _reduce(m_v * 2. * (x1 - pxb))
            comps[v * 2 + 1] = comps[v * 2 + 1] + _reduce(
                m_v * 2. * (y1 - pyb))
        # perpendicular cases (dibr_soft_mask_cuda.cu:304-348). The
        # gradient table entries are (per-face scalar) x (per-pixel
        # basis {up, up*px, up*py, up^2}): reduce the 4 basis terms,
        # then combine with per-face (8, 1) scalar math.
        for e in range(3):
            x1 = img[:, e * 2][:, None]                   # (8, 1)
            y1 = img[:, e * 2 + 1][:, None]
            j = (e + 1) % 3
            x2 = img[:, j * 2][:, None]
            y2 = img[:, j * 2 + 1][:, None]
            A = econst[:, e * 5 + 0][:, None]
            B = econst[:, e * 5 + 1][:, None]
            up, inv_down = edge_terms[e]
            inv2 = inv_down[:, :, 0]                      # (8, 1)
            C = econst[:, e * 5 + 2][:, None]
            m_up = jnp.where(edgeid == e, dLdz, 0.) * up
            s1 = _reduce(m_up)                            # sum m*up
            s2 = _reduce(m_up * pxb)                      # sum m*up*px
            s3 = _reduce(m_up * pyb)                      # sum m*up*py
            # up^2 = A*px*up + B*py*up + C*up (up is affine in px, py),
            # so the 4th moment is a free linear combination
            s4 = A * s2 + B * s3 + C * s1                 # sum m*up^2
            dzdA = 2. * (s2 - A * inv2 * s4) * inv2
            dzdB = 2. * (s3 - B * inv2 * s4) * inv2
            dzdC = 2. * s1 * inv2
            comps[e * 2] = comps[e * 2] + (dzdB - y2 * dzdC)
            comps[e * 2 + 1] = comps[e * 2 + 1] + (x2 * dzdC - dzdA)
            comps[j * 2] = comps[j * 2] + (y1 * dzdC - dzdB)
            comps[j * 2 + 1] = comps[j * 2 + 1] + (dzdA - x1 * dzdC)

        delta = jnp.concatenate(comps, axis=1)            # (8, 6)
        grad_ref[0, pl.ds(f0, FACE_CHUNK), :] = (
            grad_ref[0, pl.ds(f0, FACE_CHUNK), :] + delta)
        return count

      count = jnp.zeros((TILE_H, CT_W), jnp.int32)
      segs = [(0, t), (2, n_ct)] if t == 0 else \
          [(0, t), (1, t - 1), (2, n_ct)]
      for li, seg in segs:
          idx = ((r * n_ct + t) * 3 + li) * num_segs + sseg
          count = jax.lax.fori_loop(
              start_ref[b, idx], end_ref[b, idx],
              functools.partial(chunk_body, seg=seg, li=li), count)

    for t in range(n_ct):
        sl = slice(t * CT_W, (t + 1) * CT_W)
        px = (multiplier / width) * (
            2 * (col0 + t * CT_W) + 1 - width).astype(dtype)
        uncovered = fidx_ref[0, :, sl] < 0
        allprob = mask_ref[0, :, sl]
        dLdp = jnp.where(uncovered, grad_in_ref[0, :, sl], 0.)
        tile_body(t, px, uncovered, allprob, dLdp)


def _edge_constants(img_s):
    """(B, F, 16) packed per-edge constants [A, B, C, 1/(down+eps),
    down] x 3 edges (+1 pad lane), from (B, F, 6) scaled verts."""
    cols = []
    for i in range(3):
        x1, y1 = img_s[..., i * 2], img_s[..., i * 2 + 1]
        j = (i + 1) % 3
        x2, y2 = img_s[..., j * 2], img_s[..., j * 2 + 1]
        A = y2 - y1
        B = x1 - x2
        C = x2 * y1 - x1 * y2
        down = A * A + B * B
        cols += [A, B, C, 1. / (down + _EPS), down]
    cols.append(jnp.zeros_like(cols[0]))
    return jnp.stack(cols, axis=-1)


def _active_tiles(pixel_mask, height, width):
    """(B, n_bands, n_ct) bool: does band/column-tile contain any True
    pixel? Used to clamp chunk ranges to empty for tiles where the soft
    mask is constant 1 (covered) or carries zero incoming gradient —
    ``fori_loop`` with start == end costs nothing, so interior tiles of
    a closed silhouette skip their (often dense) face ranges entirely.
    Pure XLA prepass: no in-kernel branching on vector predicates."""
    B = pixel_mask.shape[0]
    t = pixel_mask.reshape(B, height // TILE_H, TILE_H, width // CT_W,
                           CT_W)
    return t.any(axis=(2, 4))


def _clamp_ranges(start_all, end_all, active):
    return jnp.where(active[..., None], end_all, start_all)


def _soft_mask_seg(F, dtype, bwd=False):
    """(padded face count, faces per segment, num segments) for the
    packed soft-mask table; the bwd halves the budget (its per-face
    grad output block doubles the resident face bytes)."""
    cap = F_SEG if jnp.dtype(dtype).itemsize <= 4 else F_SEG // 2
    if bwd:
        cap //= 2
    cap = max(cap, FACE_CHUNK)
    fp = F + ((-F) % FACE_CHUNK)
    if fp <= cap:
        return fp, fp, 1
    fp = F + ((-F) % cap)
    return fp, cap, fp // cap


def _seg_ranges_tiled(start_all, end_all, S, c_seg):
    """(B, nb, n_ct, 3) global chunk ranges -> block-local per segment,
    flattened (B, nb * n_ct * 3 * S): idx = ((r*n_ct+t)*3+li)*S + s."""
    s_off = jnp.arange(S, dtype=jnp.int32) * c_seg
    ls = jnp.clip(start_all[..., None] - s_off, 0, c_seg)
    le = jnp.clip(end_all[..., None] - s_off, 0, c_seg)
    le = jnp.maximum(le, ls)
    B = start_all.shape[0]
    return ls.reshape(B, -1).astype(jnp.int32), \
        le.reshape(B, -1).astype(jnp.int32)


def _prep(img_scaled, bboxes, height, width, multiplier, row_start,
          total_height, fp):
    """Pads to FACE_CHUNK, column-tile sorts, per-(band, tile) ranges,
    and packs the sorted per-face data into one (B, fp, 128) table
    (lanes [0:6] img, [6:22] edge constants, [22:26] bbox, [26] tile
    segment, [27] tmax)."""
    B, F, _ = img_scaled.shape
    pad = (-F) % FACE_CHUNK
    if pad:
        dtype = bboxes.dtype
        empty = jnp.tile(
            jnp.asarray([jnp.inf, jnp.inf, -jnp.inf, -jnp.inf], dtype),
            (B, pad, 1))
        bboxes = jnp.concatenate([bboxes, empty], axis=1)
        img_scaled = jnp.pad(img_scaled, ((0, 0), (0, pad), (0, 0)))
    order, meta_s, start_all, end_all = _tile_face_ranges(
        bboxes, height, width, float(multiplier), row_start, total_height)
    img_s = jnp.take_along_axis(img_scaled, order[..., None], axis=1)
    bb_s = jnp.take_along_axis(bboxes, order[..., None], axis=1)
    dtype = img_s.dtype
    tbl = _pack_face_table(
        [img_s, _edge_constants(img_s)[..., :16], bb_s,
         meta_s[..., 1:3].astype(dtype)], fp)
    return tbl, order, start_all, end_all


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'total_height', 'knum', 'sigmainv', 'multiplier',
    'interpret'))
def soft_mask_forward_pallas(img_scaled, bboxes, selected_face_idx,
                             row_start=0, *, height, width,
                             total_height=None, knum, sigmainv, multiplier,
                             interpret=False):
    """Soft mask forward. ``img_scaled`` (B,F,6), ``bboxes`` (B,F,4)
    enlarged by boxlen*multiplier; returns (B,H,W) soft mask."""
    B, F, _ = img_scaled.shape
    assert height % TILE_H == 0 and width % 128 == 0, (height, width)
    if total_height is None:
        total_height = height
    row_start = jnp.asarray(row_start, jnp.int32)
    fp, f_seg, S = _soft_mask_seg(F, img_scaled.dtype)
    tbl, _, start_all, end_all = _prep(
        img_scaled, bboxes, height, width, multiplier, row_start,
        total_height, fp)
    # covered pixels output exactly 1: skip fully-covered tiles
    end_all = _clamp_ranges(
        start_all, end_all,
        _active_tiles(selected_face_idx < 0, height, width))
    ls, le = _seg_ranges_tiled(start_all, end_all, S,
                               f_seg // FACE_CHUNK)
    kernel = functools.partial(
        _sm_fwd_kernel, height=height, width=width,
        total_height=total_height, knum=int(knum),
        sigmainv=float(sigmainv), multiplier=float(multiplier),
        num_segs=S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, height // TILE_H, S),
        in_specs=[
            pl.BlockSpec((1, f_seg, 128), lambda b, r, sg, *_: (b, sg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, r, sg, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, width),
                               lambda b, r, sg, *_: (b, r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, height, width), img_scaled.dtype),
        interpret=interpret,
    )(ls, le, row_start[None], tbl, selected_face_idx)


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'total_height', 'knum', 'sigmainv', 'multiplier',
    'interpret'))
def soft_mask_backward_pallas(img_scaled, bboxes, selected_face_idx,
                              soft_mask, grad_soft_mask, row_start=0, *,
                              height, width, total_height=None, knum,
                              sigmainv, multiplier, interpret=False):
    """Soft mask backward; returns (B, F, 6) grads w.r.t. the *unscaled*
    image verts (matching the reference's /multiplier convention)."""
    B, F, _ = img_scaled.shape
    assert height % TILE_H == 0 and width % 128 == 0, (height, width)
    if total_height is None:
        total_height = height
    row_start = jnp.asarray(row_start, jnp.int32)
    fp, f_seg, S = _soft_mask_seg(F, img_scaled.dtype, bwd=True)
    tbl, order, start_all, end_all = _prep(
        img_scaled, bboxes, height, width, multiplier, row_start,
        total_height, fp)
    # only uncovered pixels with nonzero incoming grad contribute
    end_all = _clamp_ranges(
        start_all, end_all,
        _active_tiles((selected_face_idx < 0) & (grad_soft_mask != 0.),
                      height, width))
    ls, le = _seg_ranges_tiled(start_all, end_all, S,
                               f_seg // FACE_CHUNK)
    n_bands = height // TILE_H
    kernel = functools.partial(
        _sm_bwd_kernel, height=height, width=width,
        total_height=total_height, knum=int(knum),
        sigmainv=float(sigmainv), multiplier=float(multiplier),
        num_segs=S, num_bands=n_bands)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, S, n_bands),
        in_specs=[
            pl.BlockSpec((1, f_seg, 128), lambda b, sg, r, *_: (b, sg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, sg, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, sg, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, sg, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f_seg, 6), lambda b, sg, r, *_:
                               (b, sg, 0),
                               memory_space=pltpu.VMEM),
    )
    grad_sorted = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, fp, 6), img_scaled.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        interpret=interpret,
    )(ls, le, row_start[None], tbl, selected_face_idx, soft_mask,
      grad_soft_mask)
    # unsort back to original face order, drop padding
    inv = jnp.argsort(order, axis=1)
    Fp = F + ((-F) % FACE_CHUNK)
    grad = jnp.take_along_axis(grad_sorted[:, :Fp], inv[..., None], axis=1)
    return grad[:, :F]
