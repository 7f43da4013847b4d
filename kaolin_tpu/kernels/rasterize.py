"""Pallas TPU kernel for the z-buffer face-selection pass of ``rasterize``.

TPU-native re-design of the reference CUDA rasterizer
(``kaolin/csrc/render/mesh/rasterization_cuda.cu:44-192``).

Design (v2, after profiling): per-chunk *scalar branching* on vector data
(load bbox -> ``any`` -> ``@pl.when``) costs ~2us per chunk on TPU (VPU/
scalar-unit sync), so pruning decisions are hoisted out of the kernel
entirely:

1. XLA prepass sorts faces by bbox ymax (descending). For each 8-row pixel
   band, the faces that can overlap it form a near-tight index range
   [start, end): ``end`` from searchsorted on the sorted ymax, ``start``
   from searchsorted on the running minimum of ymin (a monotone
   conservative bound). Culled faces (empty bbox, ymax=-inf) sort last and
   fall outside every range.
2. The kernel grid is (batch, H/8 row bands); the per-band chunk range
   arrives via scalar prefetch (SMEM), and the kernel runs an unconditional
   vectorized loop over just those chunks: 8 faces per step (sublanes)
   against the full (8, W) pixel band (lanes).

The z-test carries the ORIGINAL face index and breaks z-ties toward the
lowest original index, so results are bit-identical to the sequential CUDA
scan order (``rasterization_cuda.cu:162-169``) regardless of the sort.

Two kernels share the loop: ``rasterize_select_pallas`` (winner face +
depth only; weights/features via an XLA gather epilogue) and the fused
``rasterize_interp_pallas`` (winner + barycentric weights + interpolated
features selected in-register at chunk time). Per-face constants live in
ONE packed 128-lane table per kernel, blocked over face segments past
F_SEG so VMEM stays bounded at any face count (see the constants below);
``rasterize_bwd.py`` mirrors the layout for the analytic backward.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['rasterize_select_pallas', 'rasterize_interp_pallas']

FACE_CHUNK = 8
TILE_H = 8
CT_W = 128      # column-tile width (one vreg of lanes)
# faces per VMEM-resident table block. Per-face constants are PACKED
# into one (B, F, 128) f32 table (a (F, k) array tile-pads its minor
# dim to 128 lanes anyway — five separate arrays cost 5x the VMEM for
# the same payload, which OOM'd scoped vmem at 20k faces). Face counts
# beyond F_SEG add a third grid dimension: the table is blocked over
# segments (innermost, so each pixel band's output block is revisited
# consecutively and the z-buffer accumulates across segments in VMEM).
F_SEG = 8192


def _face_seg(F, dtype=jnp.float32):
    """(padded face count, faces per segment, num segments). The table
    keeps the input dtype (f64 runs through interpret mode in tests),
    so 8-byte dtypes halve the per-segment face budget."""
    f_seg = F_SEG if jnp.dtype(dtype).itemsize <= 4 else F_SEG // 2
    fp = F + ((-F) % FACE_CHUNK)
    if fp <= f_seg:
        return fp, fp, 1
    fp = F + ((-F) % f_seg)
    return fp, f_seg, fp // f_seg


def _pack_face_table(parts, f_pad):
    """Packs per-face column arrays (B, F, k_i) into one (B, f_pad, 128)
    f32 table, lane offsets = running sum of k_i. int32 parts must be
    pre-cast to f32 by the caller (values < 2**24 stay exact)."""
    B = parts[0].shape[0]
    F = parts[0].shape[1]
    tbl = jnp.concatenate(parts, axis=-1)
    C = tbl.shape[-1]
    assert C <= 128, C
    tbl = jnp.pad(tbl, ((0, 0), (0, f_pad - F), (0, 128 - C)))
    return tbl


def _segment_ranges(start_c, end_c, S, c_seg):
    """Global per-band chunk ranges -> per-(band, segment) block-local
    ranges, flattened to the 2D scalar-prefetch layout (B, bands * S)."""
    s_off = jnp.arange(S, dtype=jnp.int32) * c_seg
    ls = jnp.clip(start_c[..., None] - s_off, 0, c_seg)
    le = jnp.clip(end_c[..., None] - s_off, 0, c_seg)
    le = jnp.maximum(le, ls)
    B, nb = start_c.shape
    return (ls.reshape(B, nb * S).astype(jnp.int32),
            le.reshape(B, nb * S).astype(jnp.int32))


def _band_face_ranges(bboxes_sorted, height, multiplier, row_start,
                      total_height):
    """Per-8-row-band [start, end) face index ranges (conservative).

    ``bboxes_sorted``: (B, F, 4) sorted by ymax descending.
    Returns (start, end): (B, n_bands) int32 arrays.
    """
    n_bands = height // TILE_H
    ymin_s = bboxes_sorted[..., 1]
    ymax_s = bboxes_sorted[..., 3]
    run_min_ymin = jax.lax.associative_scan(jnp.minimum, ymin_s, axis=1)

    rows_top = row_start + jnp.arange(n_bands) * TILE_H   # first row of band
    rows_bot = rows_top + TILE_H - 1                      # last row of band
    # y0 = m/H*(H-2r-1), decreasing in r (rasterization_cuda.cu:86)
    H = total_height
    band_ymax = (multiplier / H) * (H - 2. * rows_top - 1.)
    band_ymin = (multiplier / H) * (H - 2. * rows_bot - 1.)

    def one(ymax_f, runmin_f):
        # end: first idx with ymax < band_ymin  (sorted desc -> use -ymax asc)
        end = jnp.searchsorted(-ymax_f, -band_ymin, side='left')
        # start: first idx with running-min-ymin <= band_ymax
        start = jnp.searchsorted(-runmin_f, -band_ymax, side='left')
        return start.astype(jnp.int32), end.astype(jnp.int32)

    start, end = jax.vmap(one)(ymax_s, run_min_ymin)
    start_c = start // FACE_CHUNK
    end_c = (end + FACE_CHUNK - 1) // FACE_CHUNK
    return start_c, jnp.maximum(end_c, start_c)


def _tile_face_ranges(bboxes, height, width, multiplier, row_start,
                      total_height):
    """Column-tiled face ranges: sort + per-(band, ctile) chunk ranges.

    A face's bbox spans ~a few pixels while a row band spans the full
    image width, so a band-only loop wastes >90% of its work in x. This
    prepass assigns every face a *segment*: its leftmost column tile
    ``tmin`` when it spans at most 2 tiles, the wide segment ``n_ct``
    when it spans more, or the culled segment ``n_ct + 1``. Faces are
    sorted by (segment, ymax desc); column tile ``t`` then only
    processes three contiguous segment ranges — own (``t``), left
    neighbor (``t - 1``, faces reaching across the tile edge) and wide —
    each restricted per 8-row band by the same searchsorted/running-min
    bounds as before (expressed as masked counts so each segment's
    bounds stay independent).

    Chunk (8-face) ranges are rounded outward, so a boundary chunk can
    be visited from two segment loops; the kernels mask per-face on the
    carried segment id to keep every (face, pixel) pair processed
    exactly once.

    Args:
        bboxes: (B, F, 4) scaled (xmin, ymin, xmax, ymax); culled faces
            carry the empty bbox (+inf, +inf, -inf, -inf). F % 8 == 0.

    Returns:
        (order (B, F) int32 sorted face order,
        meta_s (B, F, 3) int32 [orig_id, segment, tmax] in sorted order,
        start_c, end_c (B, n_bands, n_ct, 3) int32 chunk ranges with the
        last axis = [own, left, wide]).
    """
    B, F, _ = bboxes.shape
    n_ct = width // CT_W
    n_bands = height // TILE_H
    m = float(multiplier)
    xmin, ymin = bboxes[..., 0], bboxes[..., 1]
    xmax, ymax = bboxes[..., 2], bboxes[..., 3]

    # first / last pixel-center column hit by [xmin, xmax):
    # px(c) = m/W * (2c + 1 - W)  =>  c in [cmin, cmax]
    cmin = jnp.ceil((xmin * (width / m) - 1. + width) * 0.5)
    cmax = jnp.ceil((xmax * (width / m) - 1. + width) * 0.5) - 1.
    tmin = jnp.clip(jnp.floor(cmin / CT_W), 0, n_ct - 1).astype(jnp.int32)
    tmax = jnp.clip(jnp.floor(cmax / CT_W), 0, n_ct - 1).astype(jnp.int32)
    valid = (ymax > -jnp.inf) & (cmax >= cmin)
    seg = jnp.where(tmax - tmin <= 1, tmin, n_ct)
    seg = jnp.where(valid, seg, n_ct + 1).astype(jnp.int32)

    # stable two-level sort: primary segment, secondary ymax descending
    ord1 = jnp.argsort(-ymax, axis=1, stable=True).astype(jnp.int32)
    s1 = jnp.take_along_axis(seg, ord1, axis=1)
    ord2 = jnp.argsort(s1, axis=1, stable=True).astype(jnp.int32)
    order = jnp.take_along_axis(ord1, ord2, axis=1)
    seg_s = jnp.take_along_axis(seg, order, axis=1)
    ymax_s = jnp.take_along_axis(ymax, order, axis=1)
    ymin_s = jnp.take_along_axis(ymin, order, axis=1)
    tmax_s = jnp.take_along_axis(tmax, order, axis=1)

    # per-segment running min of ymin (segments are contiguous)
    def comb(a, b):
        sa, ma = a
        sb, mb = b
        return sb, jnp.where(sa == sb, jnp.minimum(ma, mb), mb)

    _, runmin = jax.lax.associative_scan(comb, (seg_s, ymin_s), axis=1)

    rows_top = row_start + jnp.arange(n_bands) * TILE_H
    rows_bot = rows_top + TILE_H - 1
    H = total_height
    band_ymax = (m / H) * (H - 2. * rows_top - 1.)
    band_ymin = (m / H) * (H - 2. * rows_bot - 1.)

    # per-(segment, band) [start, end) via masked counts
    n_seg = n_ct + 1                                   # own tiles + wide
    ks = jnp.arange(n_seg, dtype=jnp.int32)
    in_seg = seg_s[:, None, :] == ks[None, :, None]            # (B,S,F)
    seg_off = jnp.sum(seg_s[:, None, :] < ks[None, :, None],
                      axis=2).astype(jnp.int32)                # (B,S)
    hit_end = in_seg[:, :, None, :] & (
        ymax_s[:, None, None, :] >= band_ymin[None, None, :, None])
    hit_start = in_seg[:, :, None, :] & (
        runmin[:, None, None, :] > band_ymax[None, None, :, None])
    end = seg_off[:, :, None] + jnp.sum(hit_end, axis=3)       # (B,S,bands)
    start = seg_off[:, :, None] + jnp.sum(hit_start, axis=3)
    start_c = (start // FACE_CHUNK).astype(jnp.int32)
    end_c = ((end + FACE_CHUNK - 1) // FACE_CHUNK).astype(jnp.int32)
    end_c = jnp.maximum(end_c, start_c)

    # assemble per (band, tile): [own = t, left = t-1, wide = n_ct]
    sc = jnp.transpose(start_c, (0, 2, 1))                     # (B,bands,S)
    ec = jnp.transpose(end_c, (0, 2, 1))
    zero = jnp.zeros((B, n_bands, 1), jnp.int32)
    own_s, own_e = sc[..., :n_ct], ec[..., :n_ct]
    left_s = jnp.concatenate([zero, sc[..., :n_ct - 1]], axis=-1)
    left_e = jnp.concatenate([zero, ec[..., :n_ct - 1]], axis=-1)
    wide_s = jnp.broadcast_to(sc[..., n_ct:], own_s.shape)
    wide_e = jnp.broadcast_to(ec[..., n_ct:], own_e.shape)
    start_all = jnp.stack([own_s, left_s, wide_s], axis=-1)
    end_all = jnp.stack([own_e, left_e, wide_e], axis=-1)

    meta_s = jnp.stack([order, seg_s, tmax_s], axis=-1)        # (B,F,3)
    return order, meta_s, start_all, end_all


def _rasterize_kernel(start_ref, end_ref, roff_ref, tbl_ref,
                      zbuf_ref, idx_ref, *, height,
                      width, total_height, num_faces, num_segs, f_seg,
                      multiplier, eps):
    """Face table lanes: [0:4] bbox, [4:10] img verts, [10:13] z,
    [13] original id (f32, exact below 2**24)."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    s = pl.program_id(2)

    row = (roff_ref[0] + r * TILE_H
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 1)
    dtype = zbuf_ref.dtype
    # pixel centers, y-up image space, pre-scaled by multiplier
    # (rasterization_cuda.cu:85-86)
    H = total_height
    x0 = (multiplier / width) * (2 * col + 1 - width).astype(dtype)
    y0 = (multiplier / H) * (H - 2 * row - 1).astype(dtype)

    @pl.when(s == 0)
    def _():
        zbuf_ref[...] = jnp.full((1, TILE_H, width), -jnp.inf, dtype=dtype)
        idx_ref[...] = jnp.full((1, TILE_H, width), 0x7fffffff,
                                dtype=jnp.int32)

    def chunk_body(c, _):
        f0 = c * FACE_CHUNK
        face = tbl_ref[0, pl.ds(f0, FACE_CHUNK), :]           # (8, 128)
        bbox = face[:, 0:4]
        img = face[:, 4:10]
        fz = face[:, 10:13].astype(dtype)
        face_ids = face[:, 13].astype(jnp.int32)[:, None, None]

        px = x0[None, :, :]
        py = y0[None, :, :]
        hit = ((px >= bbox[:, 0][:, None, None])
               & (px < bbox[:, 2][:, None, None])
               & (py >= bbox[:, 1][:, None, None])
               & (py < bbox[:, 3][:, None, None]))

        ax = img[:, 0][:, None, None] - px
        ay = img[:, 1][:, None, None] - py
        bx = img[:, 2][:, None, None] - px
        by = img[:, 3][:, None, None] - py
        cx = img[:, 4][:, None, None] - px
        cy = img[:, 5][:, None, None] - py
        w0 = bx * cy - by * cx
        w1 = cx * ay - cy * ax
        w2 = ax * by - ay * bx
        norm = w0 + w1 + w2
        norm = norm + jnp.copysign(eps, norm)
        w0 = w0 / norm
        w1 = w1 / norm
        w2 = w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)

        z0 = (w0 * fz[:, 0][:, None, None]
              + w1 * fz[:, 1][:, None, None]
              + w2 * fz[:, 2][:, None, None])
        z0 = jnp.where(hit & inside, z0, -jnp.inf)

        # first-max over the chunk: max z, ties -> lowest ORIGINAL id
        zmax = jnp.max(z0, axis=0)                            # (th, w)
        is_max = (z0 == zmax[None, :, :]) & (zmax[None, :, :] > -jnp.inf)
        big = jnp.int32(0x7fffffff)
        cand = jnp.where(is_max, jnp.broadcast_to(face_ids, z0.shape), big)
        widx = jnp.min(cand, axis=0)

        cur_z = zbuf_ref[0, :, :]
        cur_i = idx_ref[0, :, :]
        take = (zmax > cur_z) | ((zmax == cur_z) & (widx < cur_i)
                                 & (zmax > -jnp.inf))
        zbuf_ref[0, :, :] = jnp.where(take, zmax, cur_z)
        idx_ref[0, :, :] = jnp.where(take, widx, cur_i)
        return 0

    jax.lax.fori_loop(start_ref[b, r * num_segs + s],
                      end_ref[b, r * num_segs + s], chunk_body, 0)

    # uncovered sentinel 0x7fffffff -> -1 (after the LAST segment)
    @pl.when(s == num_segs - 1)
    def _():
        final = idx_ref[0, :, :]
        idx_ref[0, :, :] = jnp.where(final == 0x7fffffff, -1, final)


def _rasterize_interp_kernel(start_ref, end_ref, roff_ref, tbl_ref,
                             idx_ref, *out_refs,
                             height, width, total_height, num_faces,
                             num_segs, f_seg, multiplier, eps, feat_dim):
    """Fused select + barycentric weights + feature interpolation.

    Same z-buffer loop as :func:`_rasterize_kernel`, but the winning
    face's barycentric weights and interpolated features are selected
    in-register at chunk time, so no per-pixel face gathers are needed
    outside the kernel (the XLA epilogue's two row-gathers were ~80% of
    the forward cost at 512^2). Face table lanes: [0:4] bbox, [4:10]
    img verts, [10:13] z, [13] original id, [14:14+3D] features.
    """
    b = pl.program_id(0)
    r = pl.program_id(1)
    s = pl.program_id(2)
    w_refs = out_refs[:3]
    f_refs = out_refs[3:3 + feat_dim]
    zbuf_ref = out_refs[3 + feat_dim]

    row = (roff_ref[0] + r * TILE_H
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 1)
    dtype = zbuf_ref.dtype
    H = total_height
    x0 = (multiplier / width) * (2 * col + 1 - width).astype(dtype)
    y0 = (multiplier / H) * (H - 2 * row - 1).astype(dtype)

    @pl.when(s == 0)
    def _():
        zbuf_ref[...] = jnp.full((1, TILE_H, width), -jnp.inf, dtype=dtype)
        idx_ref[...] = jnp.full((1, TILE_H, width), 0x7fffffff,
                                dtype=jnp.int32)
        for ref in w_refs:
            ref[...] = jnp.zeros((1, TILE_H, width), dtype=dtype)
        for ref in f_refs:
            ref[...] = jnp.zeros((1, TILE_H, width), dtype=dtype)

    def chunk_body(c, _):
        f0 = c * FACE_CHUNK
        face = tbl_ref[0, pl.ds(f0, FACE_CHUNK), :]           # (8, 128)
        bbox = face[:, 0:4]
        img = face[:, 4:10]
        fz = face[:, 10:13]
        feat = face[:, 14:14 + 3 * feat_dim]                  # (8, 3*D)
        face_ids = face[:, 13].astype(jnp.int32)[:, None, None]

        px = x0[None, :, :]
        py = y0[None, :, :]
        hit = ((px >= bbox[:, 0][:, None, None])
               & (px < bbox[:, 2][:, None, None])
               & (py >= bbox[:, 1][:, None, None])
               & (py < bbox[:, 3][:, None, None]))

        ax = img[:, 0][:, None, None] - px
        ay = img[:, 1][:, None, None] - py
        bx = img[:, 2][:, None, None] - px
        by = img[:, 3][:, None, None] - py
        cx = img[:, 4][:, None, None] - px
        cy = img[:, 5][:, None, None] - py
        w0 = bx * cy - by * cx
        w1 = cx * ay - cy * ax
        w2 = ax * by - ay * bx
        norm = w0 + w1 + w2
        norm = norm + jnp.copysign(eps, norm)
        w0 = w0 / norm
        w1 = w1 / norm
        w2 = w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)

        z0 = (w0 * fz[:, 0][:, None, None]
              + w1 * fz[:, 1][:, None, None]
              + w2 * fz[:, 2][:, None, None])
        z0 = jnp.where(hit & inside, z0, -jnp.inf)

        zmax = jnp.max(z0, axis=0)                            # (th, w)
        is_max = (z0 == zmax[None, :, :]) & (zmax[None, :, :] > -jnp.inf)
        big = jnp.int32(0x7fffffff)
        cand = jnp.where(is_max, jnp.broadcast_to(face_ids, z0.shape), big)
        widx = jnp.min(cand, axis=0)

        # exactly one sublane holds the chunk winner (ids are unique)
        sel = is_max & (cand == widx[None, :, :])

        def pick(v):
            return jnp.sum(jnp.where(sel, v, 0.), axis=0)

        cur_z = zbuf_ref[0, :, :]
        cur_i = idx_ref[0, :, :]
        take = (zmax > cur_z) | ((zmax == cur_z) & (widx < cur_i)
                                 & (zmax > -jnp.inf))
        zbuf_ref[0, :, :] = jnp.where(take, zmax, cur_z)
        idx_ref[0, :, :] = jnp.where(take, widx, cur_i)
        for k, (ref, w) in enumerate(zip(w_refs, (w0, w1, w2))):
            ref[0, :, :] = jnp.where(take, pick(w), ref[0, :, :])
        for d in range(feat_dim):
            interp = (w0 * feat[:, d][:, None, None]
                      + w1 * feat[:, feat_dim + d][:, None, None]
                      + w2 * feat[:, 2 * feat_dim + d][:, None, None])
            f_refs[d][0, :, :] = jnp.where(take, pick(interp),
                                           f_refs[d][0, :, :])
        return 0

    jax.lax.fori_loop(start_ref[b, r * num_segs + s],
                      end_ref[b, r * num_segs + s], chunk_body, 0)

    @pl.when(s == num_segs - 1)
    def _():
        final = idx_ref[0, :, :]
        idx_ref[0, :, :] = jnp.where(final == 0x7fffffff, -1, final)


@functools.partial(jax.jit, static_argnames=('height', 'width',
                                             'total_height', 'multiplier',
                                             'eps', 'interpret'))
def rasterize_interp_pallas(face_vertices_z, face_vertices_image_flat,
                            face_bboxes, face_features_flat, row_start=0, *,
                            height, width, total_height=None, multiplier,
                            eps, interpret=False):
    """Fused rasterization: per-pixel winner face, barycentric weights and
    interpolated features in one kernel pass.

    Args are as :func:`rasterize_select_pallas` plus
    ``face_features_flat``: (B, F, 3*feat_dim), layout
    (f0_0..f0_{D-1}, f1_0.., f2_0..) i.e. vertex-major.

    Returns:
        (features (B, H, W, feat_dim), face_idx (B, H, W) int32,
        weights (B, H, W, 3)).
    """
    B, F, _ = face_vertices_z.shape
    D3 = face_features_flat.shape[-1]
    D = D3 // 3
    assert height % TILE_H == 0 and width % 128 == 0, (height, width)
    if total_height is None:
        total_height = height
    row_start = jnp.asarray(row_start, jnp.int32)

    pad = (-F) % FACE_CHUNK
    if pad:
        dtype = face_bboxes.dtype
        empty = jnp.tile(
            jnp.asarray([jnp.inf, jnp.inf, -jnp.inf, -jnp.inf], dtype),
            (B, pad, 1))
        face_bboxes = jnp.concatenate([face_bboxes, empty], axis=1)
        face_vertices_z = jnp.pad(face_vertices_z,
                                  ((0, 0), (0, pad), (0, 0)))
        face_vertices_image_flat = jnp.pad(face_vertices_image_flat,
                                           ((0, 0), (0, pad), (0, 0)))
        face_features_flat = jnp.pad(face_features_flat,
                                     ((0, 0), (0, pad), (0, 0)))
        F = F + pad

    assert 14 + D3 <= 128, f'feat_dim {D} too wide for the face table'
    order = jnp.argsort(-face_bboxes[..., 3], axis=1).astype(jnp.int32)
    fz = jnp.take_along_axis(face_vertices_z, order[..., None], axis=1)
    img = jnp.take_along_axis(face_vertices_image_flat, order[..., None],
                              axis=1)
    bb = jnp.take_along_axis(face_bboxes, order[..., None], axis=1)
    ff = jnp.take_along_axis(face_features_flat, order[..., None], axis=1)

    start_c, end_c = _band_face_ranges(bb, height, float(multiplier),
                                       row_start, total_height)
    dtype = face_vertices_z.dtype
    fp, f_seg, S = _face_seg(F, dtype)
    start_s, end_s = _segment_ranges(start_c, end_c, S,
                                     f_seg // FACE_CHUNK)
    tbl = _pack_face_table(
        [bb.astype(dtype), img.astype(dtype), fz,
         order[..., None].astype(dtype), ff.astype(dtype)], fp)

    grid = (B, height // TILE_H, S)
    kernel = functools.partial(
        _rasterize_interp_kernel, height=height, width=width,
        total_height=total_height, num_faces=F, num_segs=S, f_seg=f_seg,
        multiplier=float(multiplier), eps=float(eps), feat_dim=D)
    img_block = pl.BlockSpec((1, TILE_H, width),
                             lambda b, r, s, *_: (b, r, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f_seg, 128), lambda b, r, s, *_: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[img_block] * (1 + 3 + D + 1),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, height, width), jnp.int32)]
        + [jax.ShapeDtypeStruct((B, height, width), dtype)] * (3 + D + 1),
        cost_estimate=pl.CostEstimate(
            flops=B * height * width * (64 + 8 * D) * 2,
            bytes_accessed=B * (F * (15 + D3) * 4
                                + height * width * (5 + D) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(start_s, end_s, row_start[None], tbl)
    face_idx = outs[0]
    weights = jnp.stack(outs[1:4], axis=-1)
    features = jnp.stack(outs[4:4 + D], axis=-1)
    return features, face_idx, weights


@functools.partial(jax.jit, static_argnames=('height', 'width',
                                             'total_height', 'multiplier',
                                             'eps', 'interpret'))
def rasterize_select_pallas(face_vertices_z, face_vertices_image_flat,
                            face_bboxes, row_start=0, *, height, width,
                            total_height=None, multiplier, eps,
                            interpret=False):
    """Selects the visible face (and its depth) for every pixel.

    Args:
        face_vertices_z: (B, F, 3) camera-space z per face vertex.
        face_vertices_image_flat: (B, F, 6) image-space verts (scaled by
            ``multiplier``), layout (ax, ay, bx, by, cx, cy).
        face_bboxes: (B, F, 4) (xmin, ymin, xmax, ymax), scaled; culled
            faces must carry an empty bbox (xmin=+inf, ymax=-inf).
        height, width: output image size; height % 8 == 0, width % 128 == 0.

    Returns:
        (zbuf (B, H, W), face_idx (B, H, W) int32, -1 where uncovered;
        indices refer to the ORIGINAL face order).
    """
    B, F, _ = face_vertices_z.shape
    assert height % TILE_H == 0 and width % 128 == 0, (height, width)
    if total_height is None:
        total_height = height
    row_start = jnp.asarray(row_start, jnp.int32)

    # pad the face axis to a FACE_CHUNK multiple with empty bboxes (they
    # sort last and never pass the bbox hit test)
    pad = (-F) % FACE_CHUNK
    if pad:
        dtype = face_bboxes.dtype
        empty = jnp.tile(
            jnp.asarray([jnp.inf, jnp.inf, -jnp.inf, -jnp.inf], dtype),
            (B, pad, 1))
        face_bboxes = jnp.concatenate([face_bboxes, empty], axis=1)
        face_vertices_z = jnp.pad(face_vertices_z,
                                  ((0, 0), (0, pad), (0, 0)))
        face_vertices_image_flat = jnp.pad(face_vertices_image_flat,
                                           ((0, 0), (0, pad), (0, 0)))
        F = F + pad

    # sort faces by ymax descending; culled faces (ymax=-inf) go last
    order = jnp.argsort(-face_bboxes[..., 3], axis=1).astype(jnp.int32)
    fz = jnp.take_along_axis(face_vertices_z, order[..., None], axis=1)
    img = jnp.take_along_axis(face_vertices_image_flat, order[..., None],
                              axis=1)
    bb = jnp.take_along_axis(face_bboxes, order[..., None], axis=1)

    start_c, end_c = _band_face_ranges(bb, height, float(multiplier),
                                       row_start, total_height)
    dtype = face_vertices_z.dtype
    fp, f_seg, S = _face_seg(F, dtype)
    start_s, end_s = _segment_ranges(start_c, end_c, S,
                                     f_seg // FACE_CHUNK)
    tbl = _pack_face_table(
        [bb.astype(dtype), img.astype(dtype), fz,
         order[..., None].astype(dtype)], fp)

    grid = (B, height // TILE_H, S)
    kernel = functools.partial(
        _rasterize_kernel, height=height, width=width,
        total_height=total_height, num_faces=F, num_segs=S, f_seg=f_seg,
        multiplier=float(multiplier), eps=float(eps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f_seg, 128), lambda b, r, s, *_: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, width), lambda b, r, s, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, width), lambda b, r, s, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    zbuf, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, height, width), face_vertices_z.dtype),
            jax.ShapeDtypeStruct((B, height, width), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * height * width * 64 * 2,
            bytes_accessed=B * (F * 14 * 4 + height * width * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(start_s, end_s, row_start[None], tbl)
    return zbuf, idx
