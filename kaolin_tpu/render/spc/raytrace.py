"""SPC octree ray-tracing and "pack" stream ops.

TPU-native re-design of ``kaolin/render/spc/raytrace.py:31-296`` (CUDA
``kaolin/csrc/render/spc/raytrace_cuda.cu``). The CUDA level-synchronous
BFS (decide / CUB-scan / subdivide / compactify with dynamic nugget
counts) becomes a statically-shaped XLA loop: a fixed-capacity nugget
buffer with a valid prefix, per-level vectorized AABB tests, and masked
scatter compaction (out-of-capacity scatters drop; the true count is
returned so callers can detect overflow). Children are emitted near-to-far
per parent via the octant traversal order table (octants sorted by
``(popcount(o ^ origin_octant), o)`` — generates
``raytrace_cuda.cu:48-57 VOXEL_ORDER`` exactly).

Pack ops (segmented scans/reductions over per-ray intersection runs) map
to ``jax.ops.segment_sum`` and ``jax.lax.associative_scan`` with a
segment-reset combine — no custom kernels needed on TPU.

Performance design (the TPU-shaped part): children are AABB-tested *at
emission time* — the (nuggets, 8) candidate tests are pure vector math on
the parents' data — and the surviving candidates are compacted by a
single **multi-operand sort** that carries the entire per-nugget state
(ray origin/direction, packed voxel coords, point index, ray index)
through to the next level. Rationale, measured on this backend: XLA 1D
gathers cost ~8 ns/element and scatters ~5.4 ns/element, while
``lax.sort`` costs ~1.8 ns/row *regardless of operand count* (~0.7 ns for
the nearly-sorted keys compaction produces). Sorting a candidate-index
key (parent-major order, misses keyed to INT32_MAX) therefore compacts
and reorders a dozen state columns for the price of one, leaving exactly
one gather per level — the octree-node lookup that *is* the tree walk.
Buffers only ever hold actual intersections (children are culled at
emission), so per-level capacities track true occupancy
(:func:`plan_raytrace`).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'unbatched_raytrace',
    'unbatched_raytrace_fixed',
    'level_offsets_from_octree',
    'mark_pack_boundaries',
    'mark_first_hit',
    'diff',
    'sum_reduce',
    'cumsum',
    'cumprod',
    'exponential_integration',
    'generate_primary_rays',
    'primary_rays_fn',
    'primary_rays_fn_cols',
    'generate_shadow_rays',
]


# Near-to-far octant traversal order: for a ray whose origin lies in
# octant ``c`` of the parent cell, children are visited in order of
# ascending ``(popcount(o ^ c), o)`` — the number of coordinate planes
# crossed to reach octant ``o``, ties broken by ascending octant id.
# This generates the (8, 8) CUDA constant table VOXEL_ORDER
# (raytrace_cuda.cu:48-57) exactly (validated literally in
# tests/test_raytrace.py). Note the tie-break is ascending ``o``, NOT
# ascending ``o ^ c`` — the xor-rank shortcut matches only for
# c in {0, 1}.
VOXEL_ORDER = tuple(
    tuple(sorted(range(8), key=lambda o, c=c: (bin(o ^ c).count('1'), o)))
    for c in range(8))
# inverse permutation per code: _VOXEL_RANK[c][o] = near-to-far rank of
# octant o for origin-octant code c
_VOXEL_RANK = tuple(
    tuple(row.index(o) for o in range(8)) for row in VOXEL_ORDER)


def _octant_for_rank(code, rank):
    """Per-ray child octant at near-to-far position ``rank``:
    ``VOXEL_ORDER[code][rank]`` as an 8-way select (code is a traced
    array; an (8, 8)-table gather would cost ~8.6 ns/el per rank)."""
    octant = jnp.zeros_like(code)
    for c in range(8):
        octant = jnp.where(code == c, jnp.int32(VOXEL_ORDER[c][rank]),
                           octant)
    return octant


def _ray_aabb(o, d, inv, sgn, vc, r):
    """Vectorized replica of ``spc_render_utils.cuh ray_aabb`` (Majercik et
    al. 2018 slab test). Returns 0 = miss, > 0 = entry distance,
    < 0 = ray origin inside the AABB."""
    oc = o - vc
    cmax = jnp.max(jnp.abs(oc), axis=-1)
    inside = cmax < r
    winding = jnp.where(inside, -r, r)

    d0 = (winding * sgn[..., 0] - oc[..., 0]) * inv[..., 0]
    d1 = (winding * sgn[..., 1] - oc[..., 1]) * inv[..., 1]
    d2 = (winding * sgn[..., 2] - oc[..., 2]) * inv[..., 2]
    ltxy = d[..., 1] * d0 + oc[..., 1]
    ltxz = d[..., 2] * d0 + oc[..., 2]
    ltyx = d[..., 0] * d1 + oc[..., 0]
    ltyz = d[..., 2] * d1 + oc[..., 2]
    ltzx = d[..., 0] * d2 + oc[..., 0]
    ltzy = d[..., 1] * d2 + oc[..., 1]
    test0 = (d0 >= 0.) & (jnp.abs(ltxy) <= r) & (jnp.abs(ltxz) <= r)
    test1 = (d1 >= 0.) & (jnp.abs(ltyx) <= r) & (jnp.abs(ltyz) <= r)
    test2 = (d2 >= 0.) & (jnp.abs(ltzx) <= r) & (jnp.abs(ltzy) <= r)
    dist = jnp.where(test0, d0, jnp.where(test1, d1,
                     jnp.where(test2, d2, 0.)))
    return jnp.where(inside, winding, dist)


def _sgn(d):
    # signbit(x) ? 1 : -1 (spc_render_utils.cuh:21-28)
    return jnp.where(jnp.signbit(d), 1., -1.).astype(d.dtype)


# Measured gather regimes on this backend: a chained-scan microbench
# (2026-08-20, 1M gathered elements) prices 1D gathers flat at
# ~8.6 ns/el for tables of 4k..1M rows (~6.9 at 1k) — the earlier
# ">512k slow path" did not reproduce. Chunk-splitting therefore only
# pays once tables exceed the measured-flat range; the per-level
# subtable slice is kept (neutral cost, and it pins the op to the
# level's working set).
_GATHER_MIN_ROWS = 4096
_GATHER_FAST_ROWS = 1 << 21


def _node_gather(node_tbl, pidx, lo, hi):
    """``node_tbl[pidx]`` for ``pidx`` known to lie in ``[lo, hi)``
    (static bounds — the level's row range), routed through the fast
    gather regime. Out-of-range ``pidx`` (dead lanes) clamp."""
    n = hi - lo
    idx = jnp.clip(pidx - lo, 0, n - 1)
    if n <= _GATHER_FAST_ROWS:
        sub = jax.lax.slice(node_tbl, (lo,), (hi,))
        if n < _GATHER_MIN_ROWS:
            # tiny tables also price off the fast path; zero-pad up
            sub = jnp.concatenate(
                [sub, jnp.zeros((_GATHER_MIN_ROWS - n,), node_tbl.dtype)])
        return jnp.take(sub, idx)
    chunks = -(-n // _GATHER_FAST_ROWS)
    csize = -(-n // chunks)
    out = jnp.zeros(pidx.shape, node_tbl.dtype)
    for c in range(chunks):
        clo, chi = lo + c * csize, min(lo + (c + 1) * csize, hi)
        sub = jax.lax.slice(node_tbl, (clo,), (chi,))
        cidx = jnp.clip(pidx - clo, 0, chi - clo - 1)
        sel = (pidx >= clo) & (pidx < chi)
        out = jnp.where(sel, jnp.take(sub, cidx), out)
    return out


def level_offsets_from_octree(octree):
    """Host-side per-level node offsets of an SPC octree byte array:
    ``offsets[l]`` is the row where level ``l`` starts in the byte /
    exsum tables, ``offsets[-1] == num_bytes``. Pass as the (static)
    ``level_offsets`` of :func:`unbatched_raytrace_fixed` to keep the
    per-level tree-walk gathers inside their level's subtable."""
    octree = np.asarray(octree)
    counts = [1]
    off = 0
    while off + counts[-1] < octree.shape[0]:
        nxt = int(np.bitwise_count(
            octree[off:off + counts[-1]]).sum())
        off += counts[-1]
        counts.append(nxt)
    return tuple(np.concatenate([[0], np.cumsum(counts)]).tolist())


def _banded_viable(level, cap_schedule, level_offsets, num_rays):
    """Measured gate for backend='auto' (TPU, 2026-08-21): the
    cursor-compaction banded kernel beats the XLA path once a probe
    schedule exists (13.46 vs 26.6 ms at 256^2/L8 — see BASELINE.md);
    without a schedule its worst-case buffers are unusable, and below a
    few thousand rays the fixed per-call cost dominates. Ray mode needs
    no gating since round 5: origin/direction ARRAYS ride the
    carried-plane kernel mode (63.95 vs 166.2 ms XLA at 512^2/L10) and
    ray_fn the streamed mode (38.5 ms) — banded wins in both."""
    return (cap_schedule is not None and level_offsets is not None
            and 1 <= level <= 10 and num_rays >= 4096
            and jax.default_backend() == 'tpu')


@functools.partial(jax.jit, static_argnames=('level', 'cap', 'with_exit',
                                             'cap_schedule',
                                             'return_level_counts',
                                             'ray_fn', 'level_offsets',
                                             'backend',
                                             'banded_raw_rows'))
def unbatched_raytrace_fixed(octree, point_hierarchy, exsum, origin,
                             direction, level, cap, with_exit=False,
                             cap_schedule=None,
                             return_level_counts=False, ray_fn=None,
                             level_offsets=None, backend='auto',
                             banded_raw_rows=None):
    """Statically-shaped SPC ray trace.

    Children are culled at emission: each level gathers its (already hit)
    nuggets' data once, AABB-tests all 8 child octants as (nuggets, 8)
    vector math, and scatters the survivors — each output slot written
    exactly once — so buffers hold intersections, never proposals.
    Per-level capacities default to ``min(cap, num_rays * 3 * 2^(l+1))``
    (a ray crosses at most ``3 * 2^k - 2`` cells of a ``2^k`` grid); a
    ``cap_schedule`` from :func:`plan_raytrace` tightens them to observed
    occupancy.

    Args:
        octree: (num_bytes,) uint8.
        point_hierarchy: (num_points, 3) int16 (all levels).
        exsum: (num_bytes + 1,) int32.
        origin, direction: (num_rays, 3) float.
        level (int): target octree level.
        cap (int): final nugget buffer capacity (static). If the true
            number of intersections exceeds a level's capacity results
            are truncated — check the returned ``count``.
        with_exit: also compute exit depths.
        ray_fn: optional static callable ``ray_fn(ridx) -> (o, d)``
            recomputing per-ray origin/direction rows from ray indices.
            When given, the 6 origin/direction columns are NOT carried
            through the per-level sort-compactions (the dominant cost:
            ``lax.sort`` on this backend prices ~1.9 ms per operand at
            4M rows, so an 11-operand carry costs ~2x a 5-operand one)
            but recomputed per level from the carried ray index.
            ``ray_fn`` MUST reproduce ``origin[ridx]`` /
            ``direction[ridx]`` bit-exactly (i.e. be the same math that
            generated the arrays — see :func:`primary_rays_fn`); the
            intersection set, order, ray and point indices are then
            bit-identical to the carried path, and depths match within
            ~2 ulp (XLA's FMA clustering of the slab math differs
            between the two graphs).

    Returns:
        (ray_index (cap,) int32, point_index (cap,) int32,
        depth (cap, 1 or 2) float, count () int32 — the TRUE number of
        intersections (may exceed ``cap`` on overflow); entries past
        ``min(count, cap)`` hold ray/point index -1 and depth 0.

    ``backend``: 'xla' (the sort-compaction path), 'banded' (the
    cursor-compaction Pallas kernel, ``kernels/spc_traverse.py`` —
    requires ``cap_schedule`` + ``level_offsets``; bit-exact vs 'xla'
    and ~2x faster on TPU, measured 2026-08-21), or 'auto' (banded when
    its requirements are met and the measured rule favors it — see
    ``_banded_viable``). On banded overflow (undersized schedule or
    window) the returned count exceeds ``cap`` exactly like the XLA
    path's overflow signal; :func:`unbatched_raytrace` then falls back
    to the XLA backend.
    """
    num_rays = origin.shape[0]
    assert num_rays <= cap, (num_rays, cap)
    dtype = origin.dtype
    INF = jnp.int32(0x7FFFFFFF)

    assert backend in ('auto', 'xla', 'banded'), backend
    if backend == 'banded' or (
            backend == 'auto' and _banded_viable(level, cap_schedule,
                                                 level_offsets, num_rays)):
        assert not return_level_counts, \
            'plan with the XLA backend (return_level_counts)'
        assert cap_schedule is not None and level_offsets is not None, \
            "backend='banded' needs cap_schedule and level_offsets"
        from ...kernels.spc_traverse import (build_node_table_t,
                                             traverse_banded_cc)
        tbl = build_node_table_t(octree, exsum, point_hierarchy)
        kw = (dict(ray_fn=ray_fn) if ray_fn is not None
              else dict(origin=origin, direction=direction))
        interp = jax.default_backend() != 'tpu'
        b_ridx, b_pidx, b_depth, b_count, b_oflow = traverse_banded_cc(
            tbl, num_rays, int(level),
            tuple(int(c) for c in cap_schedule),
            with_exit=with_exit,
            level_offsets=tuple(int(v) for v in level_offsets),
            raw_rows=banded_raw_rows,
            # 8-row steps keep interpret-mode (CPU test) runtime sane;
            # production TPU uses the tuned 32-row steps
            rstep=8 if interp else 32,
            interpret=interp, **kw)
        n = b_ridx.shape[0]
        if n >= cap:
            b_ridx, b_pidx, b_depth = (b_ridx[:cap], b_pidx[:cap],
                                       b_depth[:cap])
            # nuggets beyond cap are real: surface through the count
            b_oflow = b_oflow + jnp.maximum(b_count - cap, 0)
        else:
            pad = cap - n
            b_ridx = jnp.concatenate(
                [b_ridx, jnp.full((pad,), -1, jnp.int32)])
            b_pidx = jnp.concatenate(
                [b_pidx, jnp.full((pad,), -1, jnp.int32)])
            b_depth = jnp.concatenate(
                [b_depth, jnp.zeros((pad, b_depth.shape[1]), dtype)])
        total = jnp.where(b_oflow > 0, jnp.int32(cap) + b_oflow, b_count)
        return b_ridx, b_pidx, b_depth, total

    # packed per-node table: octree byte (8 bits) | exsum << 8 — one gather
    # yields both. The pack caps child ids at 2**23 (int32 sign bit);
    # fail loudly instead of traversing corrupt ids. Concrete exsum gets
    # an exact check; traced exsum a loose static bound (sum of
    # popcounts of n bytes <= 8n).
    try:
        emax = int(jnp.max(exsum[:octree.shape[0]]))
    except jax.errors.ConcretizationTypeError:
        emax = 8 * octree.shape[0]
    if emax >= (1 << 23):
        raise ValueError(
            f'octree too large for the packed node table: max child id '
            f'{emax} >= 2**23 overflows the byte|exsum<<8 int32 pack')
    node_tbl = octree.astype(jnp.int32) \
        | (exsum[:octree.shape[0]].astype(jnp.int32) << 8)

    if level == 0:
        # degenerate: test the root cell itself
        o, d = origin, direction
        inv = 1.0 / d
        entry = _ray_aabb(o, d, inv, _sgn(d), jnp.zeros((1, 3), dtype), 1.0)
        depth_cols = [entry]
        keep = entry > 0.
        if with_exit:
            exit_ = _ray_aabb(o, d, inv, _sgn(-d), jnp.zeros((1, 3), dtype),
                              1.0)
            depth_cols.append(exit_)
            keep &= exit_ > 0.
        total = jnp.sum(keep.astype(jnp.int32))
        ki = keep.astype(jnp.int32)
        pos = jnp.where(keep, jnp.cumsum(ki) - ki, cap)
        ridx = jnp.full((cap,), -1, jnp.int32).at[pos].set(
            jnp.arange(num_rays, dtype=jnp.int32), mode='drop')
        pidx = jnp.full((cap,), -1, jnp.int32).at[pos].set(
            jnp.zeros((num_rays,), jnp.int32), mode='drop')
        depth_cols = [jnp.zeros((cap,), dtype).at[pos].set(c, mode='drop')
                      for c in depth_cols]
        out = (ridx, pidx, jnp.stack(depth_cols, axis=-1), total)
        if return_level_counts:
            return out + (jnp.zeros((0,), jnp.int32),)
        return out

    # level-0 state, one nugget per ray at the root: the full per-nugget
    # state (packed x<<16|y, z, point index, ray index, o, d) is CARRIED
    # through each level's sort-compaction rather than re-gathered
    ridx = jnp.arange(num_rays, dtype=jnp.int32)
    pidx = jnp.zeros((num_rays,), jnp.int32)
    xy = jnp.zeros((num_rays,), jnp.int32)
    zz = jnp.zeros((num_rays,), jnp.int32)
    if ray_fn is None:
        ocols = [origin[:, a] for a in range(3)]
        dcols = [direction[:, a] for a in range(3)]
    valid = jnp.ones((num_rays,), bool)
    overflow = jnp.asarray(0, jnp.int32)
    level_counts = []
    out_depth_cols = None

    for l in range(level):
        c_in = ridx.shape[0]
        # true intersections at level l+1: <= cells crossed per ray. A
        # generic ray crosses <= 3*2^k - 2 cells of a 2^k grid, but the
        # boundary-inclusive slab test (reference spc_render_utils.cuh:
        # |lt| <= r) makes a ray lying exactly in a lattice plane touch
        # cells on both sides — 6*2^k covers the worst case (edge rays)
        c_out = min(cap, num_rays * min(8 ** (l + 1), 6 * 2 ** (l + 1)),
                    8 * c_in)
        if cap_schedule is not None:
            c_out = min(c_out, int(cap_schedule[l]))
        last = l == level - 1

        # the one structural gather per level: the tree walk itself.
        # pidx here holds level-l node ids, which occupy the contiguous
        # row range [level_offsets[l], level_offsets[l+1]) of the byte /
        # exsum tables — gathering from that subtable keeps the op in
        # the backend's fast regime (see _node_gather).
        if level_offsets is not None:
            node = _node_gather(node_tbl, pidx,
                                int(level_offsets[l]),
                                int(level_offsets[l + 1]))
        else:
            node = jnp.take(node_tbl, jnp.maximum(pidx, 0))
        bits = node & 0xFF
        r = 1.0 / (1 << l)
        rc = r * 0.5
        p = jnp.stack([(xy >> 16).astype(dtype), (xy & 0xFFFF).astype(dtype),
                       zz.astype(dtype)], axis=-1)
        vc = r * (2. * p + 1.) - 1.
        if ray_fn is None:
            o = jnp.stack(ocols, axis=-1)
            d = jnp.stack(dcols, axis=-1)
        elif l == 0:
            o, d = origin, direction       # ridx is the identity here
        else:
            o, d = ray_fn(ridx)
        inv = 1.0 / d
        sgn = _sgn(d)
        if with_exit and last:
            sgn_exit = _sgn(-d)
        # ray-origin octant code (reference subdivide kernel,
        # raytrace_cuda.cu:252-259) -> near-to-far child emission order
        frac = (0.5 * o + 0.5) - r * (p + 0.5)
        code = ((frac[:, 0] > 0) * 4 + (frac[:, 1] > 0) * 2
                + (frac[:, 2] > 0) * 1).astype(jnp.int32)

        # per-octant-rank candidate children, tested as (c_in,) columns
        keep_cols, pidx_cols, xy_cols, z_cols = [], [], [], []
        entry_cols, exit_cols = [], []
        for rank in range(8):
            octant = _octant_for_rank(code, rank)
            exists = ((bits >> octant) & 1) > 0
            ox, oy, oz = (octant >> 2) & 1, (octant >> 1) & 1, octant & 1
            off = jnp.stack([ox, oy, oz], axis=-1).astype(dtype)
            vc_child = vc - rc + r * off
            entry = _ray_aabb(o, d, inv, sgn, vc_child, rc)
            if last:
                hit = entry > 0.
                entry_cols.append(entry)
                if with_exit:
                    exit_ = _ray_aabb(o, d, inv, sgn_exit, vc_child, rc)
                    hit &= exit_ > 0.
                    exit_cols.append(exit_)
            else:
                hit = entry != 0.          # origin-inside (< 0) counts
            keep_cols.append(exists & hit & valid)
            cnt = jnp.bitwise_count(
                (bits & ((2 << octant) - 1)).astype(jnp.uint32)
            ).astype(jnp.int32)
            pidx_cols.append((node >> 8) + cnt)
            if not last:
                xy_cols.append((xy << 1) | (ox << 16) | oy)
                z_cols.append((zz << 1) | oz)

        def flat(cols):
            return jnp.stack(cols, axis=1).reshape(-1)   # parent-major

        keep = flat(keep_cols)
        total = jnp.sum(keep.astype(jnp.int32))
        # sort-compaction: candidate row index (already in output order —
        # parent-major, near-to-far rank within parent) keyed to INF for
        # misses; every carried state column rides the same sort
        key = jnp.where(keep, jnp.arange(8 * c_in, dtype=jnp.int32), INF)

        def bc(col):
            return jnp.broadcast_to(col[:, None], (c_in, 8)).reshape(-1)

        ops = [key, bc(ridx), flat(pidx_cols)]
        if last:
            ops.append(flat(entry_cols))
            if with_exit:
                ops.append(flat(exit_cols))
        else:
            ops += [flat(xy_cols), flat(z_cols)]
            if ray_fn is None:
                ops += [bc(c) for c in ocols] + [bc(c) for c in dcols]
        sorted_ops = jax.lax.sort(tuple(ops), num_keys=1,
                                  is_stable=False)
        sorted_ops = [op[:c_out] for op in sorted_ops]
        key = sorted_ops[0]
        valid = key != INF
        ridx, pidx = sorted_ops[1], sorted_ops[2]
        if last:
            out_depth_cols = sorted_ops[3:]
        else:
            xy, zz = sorted_ops[3], sorted_ops[4]
            if ray_fn is None:
                ocols = sorted_ops[5:8]
                dcols = sorted_ops[8:11]
        overflow = jnp.maximum(overflow, total - c_out)
        level_counts.append(total)

    count = jnp.sum(valid.astype(jnp.int32))
    c_fin = ridx.shape[0]
    pad = cap - c_fin
    assert pad >= 0, (c_fin, cap)
    out_ridx = jnp.where(valid, ridx, -1)
    out_pidx = jnp.where(valid, pidx, -1)
    out_depth = jnp.stack(
        [jnp.where(valid, c, 0.) for c in out_depth_cols], axis=-1)
    if pad:
        out_ridx = jnp.concatenate(
            [out_ridx, jnp.full((pad,), -1, jnp.int32)])
        out_pidx = jnp.concatenate(
            [out_pidx, jnp.full((pad,), -1, jnp.int32)])
        out_depth = jnp.concatenate(
            [out_depth, jnp.zeros((pad, out_depth.shape[1]), dtype)])
    # signal truncation at ANY level by reporting a count beyond cap so
    # callers (unbatched_raytrace) regrow their buffers
    total = jnp.where(overflow > 0, jnp.int32(cap) + overflow, count)
    if return_level_counts:
        return out_ridx, out_pidx, out_depth, total, jnp.stack(level_counts)
    return out_ridx, out_pidx, out_depth, total


def plan_raytrace(octree, point_hierarchy, exsum, origin, direction,
                  level, cap=None, margin=1.25, ray_fn=None,
                  level_offsets=None, return_counts=False):
    """Probes a trace and returns a tight per-level ``cap_schedule``
    (tuple, static) for :func:`unbatched_raytrace_fixed` — per-level
    buffers sized to the actual nugget counts (x ``margin``, rounded up
    to 1024). Use for repeated tracing of the same scene (training
    loops): buffers shrink from the worst-case bound to the observed
    occupancy. With ``return_counts`` also returns the RAW probe counts
    (tuple of ints, un-margined) — feed those, not the schedule, to
    :func:`kernels.spc_traverse.schedule_from_counts` so margins don't
    compound."""
    num_rays = origin.shape[0]
    if cap is None:
        cap = 64 * num_rays
    *_, counts = unbatched_raytrace_fixed(
        octree, point_hierarchy, exsum, origin, direction, int(level), cap,
        return_level_counts=True, ray_fn=ray_fn,
        level_offsets=level_offsets)
    counts = np.asarray(counts)
    sched = tuple(int(-(-int(c * margin) // 1024) * 1024) for c in counts)
    if return_counts:
        return sched, tuple(int(c) for c in counts)
    return sched


# eager-wrapper probe-schedule cache: scene digest -> probe counts.
# A stale schedule is SAFE (banded overflow is detected and falls back
# to the XLA path, evicting the entry), so keying on the octree bytes +
# trace shape (not the ray values) is sound.
_EAGER_SCHED_CACHE = {}
_EAGER_SCHED_CACHE_MAX = 16


def _eager_sched_key(octree, level, num_rays, with_exit):
    import hashlib
    digest = hashlib.sha1(np.asarray(octree).tobytes()).hexdigest()
    return (digest, int(level), int(num_rays), bool(with_exit))


def unbatched_raytrace(octree, point_hierarchy, pyramid, exsum, origin,
                       direction, level, return_depth=True, with_exit=False,
                       max_nuggets=None, backend='auto'):
    """Ray-traces an unbatched SPC, returning dynamically-sized results.

    Behavior matches ``kaolin.render.spc.unbatched_raytrace``
    (``kaolin/render/spc/raytrace.py:31``): intersections sorted by ray
    then near-to-far depth. Host wrapper over
    :func:`unbatched_raytrace_fixed` (use that directly inside jit).

    Args:
        octree, point_hierarchy, pyramid, exsum: SPC structure.
        origin, direction: (num_rays, 3).
        level (int): target level.
        return_depth / with_exit: include entry (and exit) depths.
        max_nuggets: static buffer capacity (default: 64 * num_rays,
            doubled on overflow automatically).
        backend: 'auto' (default — the banded cursor-compaction kernel
            when the measured gate favors it: TPU, >= 4096 rays; else
            the XLA path), 'xla' (one-shot tracing), or 'banded'
            (force the Pallas kernel). The banded path needs a probe
            trace to plan buffers; probe schedules are cached per
            (octree bytes, level, num_rays) so repeated eager calls on
            the same scene only probe once. Banded overflow (stale or
            undersized schedule) transparently falls back to 'xla' and
            evicts the cached schedule.

    Returns:
        (ray_index (N,), point_index (N,)[, depth (N, 1 or 2)]).
    """
    assert backend in ('auto', 'xla', 'banded'), backend
    num_rays = origin.shape[0]
    cap = int(max_nuggets) if max_nuggets is not None else 64 * num_rays
    offs = level_offsets_from_octree(octree)
    sched = None
    skey = None
    want_banded = backend == 'banded' or (
        backend == 'auto' and 1 <= int(level) <= 10 and num_rays >= 4096
        and jax.default_backend() == 'tpu')
    if want_banded:
        skey = _eager_sched_key(octree, level, num_rays, with_exit)
        sched = _EAGER_SCHED_CACHE.get(skey)
        if sched is None:
            _, sched = plan_raytrace(octree, point_hierarchy, exsum,
                                     origin, direction, level, cap=cap,
                                     level_offsets=offs,
                                     return_counts=True)
            if len(_EAGER_SCHED_CACHE) >= _EAGER_SCHED_CACHE_MAX:
                _EAGER_SCHED_CACHE.pop(next(iter(_EAGER_SCHED_CACHE)))
            _EAGER_SCHED_CACHE[skey] = sched
    while True:
        ridx, pidx, depth, count = unbatched_raytrace_fixed(
            octree, point_hierarchy, exsum, origin, direction,
            int(level), cap, bool(with_exit), level_offsets=offs,
            cap_schedule=sched,
            backend='banded' if want_banded else 'xla')
        n = int(count)
        if n <= cap:
            break
        if want_banded:
            # banded overflow (undersized schedule or window): the XLA
            # path has no such failure mode — fall back and evict the
            # schedule so the next call re-probes
            want_banded = False
            sched = None
            if skey is not None:
                _EAGER_SCHED_CACHE.pop(skey, None)
            continue
        cap = max(2 * cap, n)
    ridx = ridx[:n]
    pidx = pidx[:n]
    if return_depth:
        return ridx, pidx, depth[:n]
    return ridx, pidx


def mark_pack_boundaries(pack_ids):
    """True at the first element of each pack (run of equal ids).

    Reference: ``kaolin/render/spc/raytrace.py:86``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> ids = jnp.asarray([0, 0, 1, 1, 1, 3])
        >>> print(np.asarray(mark_pack_boundaries(ids)).astype(np.int32))
        [1 0 1 0 0 1]
    """
    first = jnp.ones((1,), bool)
    rest = pack_ids[1:] != pack_ids[:-1]
    return jnp.concatenate([first, rest])


def _seg_ids(boundaries):
    return jnp.cumsum(boundaries.astype(jnp.int32)) - 1


def diff(feats, boundaries):
    """Per-pack forward difference, 0 at each pack's last element.

    Reference: ``kaolin/render/spc/raytrace.py:124``.
    """
    nxt = jnp.concatenate([feats[1:], jnp.zeros_like(feats[:1])], axis=0)
    is_last = jnp.concatenate([boundaries[1:], jnp.ones((1,), bool)])
    return jnp.where(is_last[:, None], 0., nxt - feats)


def sum_reduce(feats, boundaries, num_packs=None):
    """Sums features within each pack.

    Reference: ``kaolin/render/spc/raytrace.py:208``. Static shapes under
    jit: the result has ``num_packs`` rows if given (static), else
    ``num_elems`` rows zero-padded past the true pack count (slice with
    ``int(boundaries.sum())`` outside jit for reference parity).
    
    Example:
        >>> import jax.numpy as jnp
        >>> feats = jnp.asarray([[1.], [2.], [3.], [4.]])
        >>> b = jnp.asarray([True, False, True, False])
        >>> print(np.asarray(sum_reduce(feats, b, num_packs=2))[:, 0])
        [3. 7.]
    """
    seg = _seg_ids(boundaries)
    n = num_packs if num_packs is not None else feats.shape[0]
    return jax.ops.segment_sum(feats, seg, num_segments=n)


def _segmented_scan(feats, boundaries, op, identity, exclusive, reverse):
    seg = _seg_ids(boundaries)

    def combine(a, b):
        va, ia = a
        vb, ib = b
        same = (ia == ib)[..., None] if va.ndim > ia.ndim else (ia == ib)
        return jnp.where(same, op(va, vb), vb), ib

    incl, _ = jax.lax.associative_scan(combine, (feats, jnp.broadcast_to(
        seg[:, None], feats.shape)), axis=0, reverse=reverse)
    if not exclusive:
        return incl
    ident = jnp.full_like(feats[:1], identity)
    if not reverse:
        shifted = jnp.concatenate([ident, incl[:-1]], axis=0)
        return jnp.where(boundaries[:, None], identity, shifted)
    shifted = jnp.concatenate([incl[1:], ident], axis=0)
    is_last = jnp.concatenate([boundaries[1:], jnp.ones((1,), bool)])
    return jnp.where(is_last[:, None], identity, shifted)


def cumsum(feats, boundaries, exclusive=False, reverse=False):
    """Segmented cumulative sum (tf.math.cumsum options).

    Reference: ``kaolin/render/spc/raytrace.py:221``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> feats = jnp.asarray([[1.], [2.], [3.], [4.]])
        >>> b = jnp.asarray([True, False, True, False])
        >>> print(np.asarray(cumsum(feats, b))[:, 0])
        [1. 3. 3. 7.]
    """
    return _segmented_scan(feats, boundaries, jnp.add, 0., exclusive,
                           reverse)


def cumprod(feats, boundaries, exclusive=False, reverse=False):
    """Segmented cumulative product (tf.math.cumprod options).

    Reference: ``kaolin/render/spc/raytrace.py:241``.
    """
    return _segmented_scan(feats, boundaries, jnp.multiply, 1., exclusive,
                           reverse)


def exponential_integration(feats, tau, boundaries, exclusive=True):
    """Beer-Lambert transmittance integration over packs (cumsum form).

    Reference: ``kaolin/render/spc/raytrace.py:265``.

    Returns:
        (integrated feats (num_elems_or_packs, feat_dim), transmittance
        (num_elems, 1)). The integrated features array has one row per
        pack in the first ``num_packs`` entries (zero-padded, static
        shape); pair with ``mark_pack_boundaries`` counts to slice.
    """
    alpha = 1.0 - jnp.exp(-tau)
    transmittance = jnp.exp(-1.0 * cumsum(tau, boundaries,
                                          exclusive=exclusive))
    transmittance = transmittance * alpha
    seg = _seg_ids(boundaries)
    feats_out = jax.ops.segment_sum(transmittance * feats, seg,
                                    num_segments=feats.shape[0])
    return feats_out, transmittance


def primary_rays_fn(height, width, eye, at, up, fov, dtype=jnp.float32):
    """Index-to-ray closure for pinhole lookat primary rays.

    Returns ``fn`` with ``fn(ridx (N,) int32) -> (origin (N, 3),
    direction (N, 3))`` — the same rows :func:`generate_primary_rays`
    produces, bit-exactly (identical op sequence on identical scalars).
    Pass as ``ray_fn`` to :func:`unbatched_raytrace_fixed`: recomputing
    rays from the carried ray index drops 6 of the 11 sort-compaction
    operands, halving the dominant per-level cost.
    """
    eye = jnp.asarray(eye, dtype)
    at = jnp.asarray(at, dtype)
    up = jnp.asarray(up, dtype)
    z = eye - at
    z = z / jnp.linalg.norm(z)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    tan = jnp.tan(jnp.asarray(fov, dtype) / 2.)

    def fn(ridx):
        # optimization_barrier pins each arithmetic step to its own
        # fusion cluster: under jit, XLA otherwise contracts the
        # mul->sub chains into FMAs *depending on the consuming fusion*,
        # so the recomputed rows would drift 1 ulp from the eagerly
        # computed arrays (eager dispatch compiles per primitive) and
        # flip razor-edge |lt| == r slab decisions in the tracer.
        b = jax.lax.optimization_barrier
        px = b(((ridx % width).astype(dtype) + 0.5) / width * 2.) - 1.
        py = b(((ridx // width).astype(dtype) + 0.5) / height * 2.) - 1.
        t1 = b(px[:, None] * x[None] * tan * (width / height))
        t2 = b(py[:, None] * y[None] * tan)
        dirs = b(b(t1 - t2) - z[None])
        sq = b(dirs * dirs)
        nrm = b(jnp.sqrt(jnp.sum(sq, axis=-1, keepdims=True)))
        dirs = b(dirs / nrm)
        o = jnp.broadcast_to(eye, dirs.shape).astype(dtype)
        return o, dirs

    return fn


def primary_rays_fn_cols(height, width, eye, at, up, fov,
                         dtype=jnp.float32):
    """Componentwise variant of :func:`primary_rays_fn` for the Pallas
    traversal kernel: ``fn(ridx) -> (ox, oy, oz, dx, dy, dz)`` where
    every output has ``ridx``'s shape (no trailing size-3 axis, which
    would tile-pad 43x inside Mosaic — see CLAUDE.md). Same arithmetic
    on the same scalars as :func:`primary_rays_fn`, traced into the
    kernel; FMA clustering there is Mosaic's, so razor-edge slab
    decisions may differ from the XLA path by 1 ulp."""
    # identical scalar pipeline to primary_rays_fn (jnp ops), extracted
    # to host floats so the closure embeds plain constants
    eye_j = jnp.asarray(eye, dtype)
    at_j = jnp.asarray(at, dtype)
    up_j = jnp.asarray(up, dtype)
    z_j = eye_j - at_j
    z_j = z_j / jnp.linalg.norm(z_j)
    x_j = jnp.cross(up_j, z_j)
    x_j = x_j / jnp.linalg.norm(x_j)
    y_j = jnp.cross(z_j, x_j)
    eye, z, x, y = (np.asarray(v) for v in (eye_j, z_j, x_j, y_j))
    tan = np.asarray(jnp.tan(jnp.asarray(fov, dtype) / 2.))
    aspect = width / height

    def fn(ridx):
        px = ((ridx % width).astype(dtype) + 0.5) / width * 2. - 1.
        py = ((ridx // width).astype(dtype) + 0.5) / height * 2. - 1.
        dcols = []
        for a in range(3):
            # same association order as primary_rays_fn:
            # ((px * x) * tan) * aspect  /  (py * y) * tan
            t1 = ((px * dtype(x[a])) * tan) * aspect
            t2 = (py * dtype(y[a])) * tan
            dcols.append(t1 - t2 - dtype(z[a]))
        nrm = jnp.sqrt(dcols[0] * dcols[0] + dcols[1] * dcols[1]
                       + dcols[2] * dcols[2])
        d = [c / nrm for c in dcols]
        o = [jnp.full(ridx.shape, dtype(eye[a])) for a in range(3)]
        return o[0], o[1], o[2], d[0], d[1], d[2]

    return fn


def generate_primary_rays(height, width, eye, at, up, fov, dtype=jnp.float32):
    """Pinhole primary rays from a lookat camera (deprecated CUDA op
    ``generate_primary_rays_cuda``, reimplemented in jnp).

    Returns:
        (origin (H*W, 3), direction (H*W, 3)).
    """
    fn = primary_rays_fn(height, width, eye, at, up, fov, dtype)
    return fn(jnp.arange(height * width, dtype=jnp.int32))


def generate_shadow_rays(ray_o, ray_d, light, plane):
    """Shadow rays toward a light for rays hitting a ground plane.

    Reference: deprecated CUDA op ``generate_shadow_rays_cuda``
    (``raytrace_cuda.cu:799-897``): intersect each primary ray with the
    plane; for hits, emit a ray from the light toward the hit point.

    Args:
        ray_o, ray_d: (num_rays, 3) primary rays.
        light: (3,) light position.
        plane: (4,) plane coefficients (a, b, c, d).

    Returns:
        (src (N, 3) = light origin, dst (N, 3) = direction light->point,
        map (N,) int32 indices of the originating primary rays) for the N
        rays that hit the plane (dynamically sized; host-side trim).
    """
    a = jnp.sum(ray_o * plane[:3], axis=-1) + plane[3]
    b = jnp.sum(ray_d * plane[:3], axis=-1)
    t = -a / b
    hit = (jnp.abs(b) > 1e-3) & (t > 0.)
    pts = ray_o + t[:, None] * ray_d
    hit_np = np.asarray(hit)
    idx = np.nonzero(hit_np)[0]
    hit_pts = pts[jnp.asarray(idx)]
    dst = hit_pts - light[None]
    dst = dst / jnp.linalg.norm(dst, axis=-1, keepdims=True)
    src = jnp.broadcast_to(light, dst.shape)
    return src, dst, jnp.asarray(idx.astype(np.int32))


def mark_first_hit(ridx):
    """Deprecated alias of :func:`mark_pack_boundaries`
    (reference ``kaolin/render/spc/raytrace.py:108``)."""
    import warnings
    warnings.warn('mark_first_hit is deprecated, '
                  'use mark_pack_boundaries instead', DeprecationWarning)
    return mark_pack_boundaries(ridx)
