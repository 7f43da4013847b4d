"""Banded sorted-frontier SPC traversal — the Pallas tree-walk kernel.

TPU-native replacement for the XLA sort-compaction traversal in
``render/spc/raytrace.py`` (reference CUDA: level-synchronous BFS,
``kaolin/csrc/render/spc/raytrace_cuda.cu:64-269``). The XLA path's
per-level floor is one ~13 ns/el node gather plus an 8C-row multi-operand
sort (~2 ns/row); both are machinery, not math. This kernel removes both
by re-shaping the frontier so neither is needed:

* **Octant-order emission keeps the frontier id-sorted for free.** A
  node's children occupy consecutive ids (``exsum`` base + prefix
  popcount), so emitting candidates in *octant* order — not the CUDA
  VOXEL_ORDER near-to-far order — produces a child frontier that is
  ascending in node id wherever the parent frontier was. The reference's
  exact output order (ray-major, near-to-far DFS) is restored by ONE
  final sort over carried ``(ray, path_key)`` columns, where
  ``path_key`` accumulates the VOXEL_ORDER rank base-8 per level.

* **A banded frontier turns the tree-walk gather into MXU matmuls.**
  The frontier lives in (rows, 128) lane tiles; each row's node ids span
  a narrow window of the (level-contiguous) node table. An XLA prepass
  computes per-row windows; the kernel fetches two adjacent 4096-wide
  blocks of a *transposed* (8, N) table through
  ``PrefetchScalarGridSpec`` index maps (the pipeline double-buffers
  them) and gathers each row's 128 node words as a
  ``(8, CHUNK) @ (CHUNK, 128)`` one-hot matmul — iota-vs-id compare
  builds the one-hot, f32-HIGHEST keeps integer payloads < 2**24 exact.

* **One transposeless sort per level re-densifies the frontier.** The
  slotted output is sorted by child id in its native slot-plane layout
  (sort cost on this backend is ~3 ms fixed + ~0.5 ns/row and does NOT
  depend on input order or operand count — measured, see BASELINE.md —
  so no interleave transposes, which cost another ~3 ms fixed each).
  The next level therefore starts dense (fewest kernel rows), globally
  id-sorted (narrow windows), and free of slot-lineage span growth.
  With ``smax_sort < 8`` an in-kernel packing network first moves
  survivors to the low slots so only a slot prefix needs sorting.

Per level the kernel does gather + slab tests + emission in one pass
over VMEM-resident tiles; XLA between levels reduces per-row min/max
ids and runs the one re-densify sort. The measured remaining gap to
the XLA path is exactly those per-level sort fixed costs; the verified
next step is in-kernel cursor compaction (sequential-grid SMEM cursor
+ dynamic-offset overlapping DMA writes) which removes them.

Exactness: the slab test is the same arithmetic as the XLA path
(``_ray_aabb``); Mosaic's instruction selection may differ from XLA's
FMA clustering on razor-edge ``|lt| == r`` decisions, so parity with the
XLA path is asserted exactly on generic scenes and the XLA path remains
the default backend (see ``unbatched_raytrace_fixed``).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Table window block width: the kernel fetches three adjacent blocks
# per step, guaranteeing 2*W_BLK+1 ids of coverage past the rounded-down
# window start. The frontier is re-densified and globally id-sorted
# every level, so an 8x128-parent step reads a nearly-consecutive id
# range (~a few hundred to ~3k ids); 4097 guaranteed coverage leaves
# headroom, and wider spans (frontiers far sparser than the level's
# node table) raise the overflow flag (caller falls back to XLA).
# 8192: a sorted deep-level step holds 4096 ids whose span is inflated
# by the unvisited-node gap factor (measured ~2.8x at 512^2/L10, spans
# to ~11.7k) — 2*W_BLK+1 = 16385 guaranteed coverage absorbs gap
# factors to 4x; beyond that the overflow flag falls back to XLA.
W_BLK = 8192
CHUNK = 512           # one-hot gather chunk (sublanes); divides W_BLK
# frontier rows per grid step: amortizes the ~10 us per-step machinery
# (spec DMA setup etc.) measured at 8 rows/step
RSTEP = 32

# Near-to-far octant order for origin-octant code c: octants sorted by
# (popcount(o ^ c), o) — generates the CUDA VOXEL_ORDER table
# (raytrace_cuda.cu:48-57) exactly; same rule as
# render/spc/raytrace.py VOXEL_ORDER (tie-break by ascending o, not
# o ^ c). _VOXEL_RANK[c][o] is the inverse permutation: the rank the
# path key accumulates for octant o under code c.
_VOXEL_RANK = tuple(
    tuple(sorted(range(8),
                 key=lambda o, c=c: (bin(o ^ c).count('1'), o)).index(o)
          for o in range(8))
    for c in range(8))

_INT_MAX = jnp.int32(0x7FFFFFFF)


def build_node_table_t(octree, exsum, point_hierarchy=None):
    """Transposed node table for the traversal kernel: (8, Npad) f32,
    row 0 = octree byte, row 1 = first-child id (``exsum``), rows 2-4 =
    node (x, y, z) coords when ``point_hierarchy`` is given (required by
    the cursor-compaction kernel, which re-reads parent coords through
    the same windowed gather instead of carrying them), rows 5-7 zero.
    Npad rounds up to a W_BLK multiple plus one spare block so the
    kernel's two adjacent block fetches never run off the end. Values
    stay exact through the f32 one-hot matmuls (byte < 2**8, child ids
    < 2**24, coords < 2**15)."""
    n = octree.shape[0]
    # f32 holds integers exactly only below 2**24: oversized octrees
    # would silently corrupt child ids through the one-hot matmuls
    try:
        emax = int(jnp.max(exsum[:n])) if n else 0
    except jax.errors.ConcretizationTypeError:
        emax = 8 * n                     # loose static bound when traced
    if emax >= (1 << 24):
        raise ValueError(
            f'octree too large for the banded traversal kernel: max '
            f'child id {emax} >= 2**24 would lose precision in the f32 '
            f'one-hot gather; use the XLA backend')
    npad = (-(-(n) // W_BLK) + 2) * W_BLK
    tbl = jnp.zeros((8, npad), jnp.float32)
    tbl = tbl.at[0, :n].set(octree.astype(jnp.float32))
    tbl = tbl.at[1, :n].set(exsum[:n].astype(jnp.float32))
    if point_hierarchy is not None:
        for a in range(3):
            tbl = tbl.at[2 + a, :n].set(
                point_hierarchy[:n, a].astype(jnp.float32))
    return tbl


def _ray_cols_aabb(ox, oy, oz, dx, dy, dz, ivx, ivy, ivz,
                   sx, sy, sz, cx, cy, cz, r):
    """Component-form replica of raytrace._ray_aabb (Majercik slab
    test) on (8, 128) tiles. Returns 0 = miss, > 0 = entry distance,
    < 0 = origin inside."""
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    cmax = jnp.maximum(jnp.maximum(jnp.abs(ocx), jnp.abs(ocy)),
                       jnp.abs(ocz))
    inside = cmax < r
    winding = jnp.where(inside, -r, r)
    d0 = (winding * sx - ocx) * ivx
    d1 = (winding * sy - ocy) * ivy
    d2 = (winding * sz - ocz) * ivz
    ltxy = dy * d0 + ocy
    ltxz = dz * d0 + ocz
    ltyx = dx * d1 + ocx
    ltyz = dz * d1 + ocz
    ltzx = dx * d2 + ocx
    ltzy = dy * d2 + ocy
    test0 = (d0 >= 0.) & (jnp.abs(ltxy) <= r) & (jnp.abs(ltxz) <= r)
    test1 = (d1 >= 0.) & (jnp.abs(ltyx) <= r) & (jnp.abs(ltyz) <= r)
    test2 = (d2 >= 0.) & (jnp.abs(ltzx) <= r) & (jnp.abs(ltzy) <= r)
    dist = jnp.where(test0, d0, jnp.where(test1, d1,
                     jnp.where(test2, d2, 0.)))
    return jnp.where(inside, winding, dist)


def _level_kernel_body(l, last, with_exit, ray_fn_cols, ray_refs, pack,
                       wblk_ref, cbase_ref, cnum_ref,
                       pidx_ref, ridx_ref, xy_ref, zz_ref, key_ref,
                       tbl_a, tbl_b, tbl_c, *out_refs):
    """One traversal level for 8 frontier rows (1024 parents)."""
    i = pl.program_id(0)
    f32 = jnp.float32
    dt = f32

    # ---- one-hot windowed gather of node words -------------------------
    wblk = wblk_ref[0, i]
    byte_rows = []
    base_rows = []
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 0)
    for rr in range(RSTEP):
        pidx_r = pidx_ref[rr, :].reshape(1, LANES)

        def chunk_body(k, acc, pidx_r=pidx_r, rr=rr):
            cb = cbase_ref[0, i * RSTEP + rr] + k  # abs chunk idx (CHUNK units)
            off_a = cb * CHUNK - wblk * W_BLK      # lane offset in block A
            in_a = off_a < W_BLK
            # offsets are CHUNK-multiples by construction (clip bounds
            # are too) — Mosaic requires the proof hint for dynamic
            # lane-dimension vector loads
            in_b = off_a < 2 * W_BLK
            ds_a = pl.multiple_of(jnp.clip(off_a, 0, W_BLK - CHUNK), CHUNK)
            ds_b = pl.multiple_of(jnp.clip(off_a - W_BLK, 0,
                                           W_BLK - CHUNK), CHUNK)
            ds_c = pl.multiple_of(jnp.clip(off_a - 2 * W_BLK, 0,
                                           W_BLK - CHUNK), CHUNK)
            sl_a = tbl_a[:, pl.ds(ds_a, CHUNK)]
            sl_b = tbl_b[:, pl.ds(ds_b, CHUNK)]
            sl_c = tbl_c[:, pl.ds(ds_c, CHUNK)]
            vals = jnp.where(in_a, sl_a,
                             jnp.where(in_b, sl_b, sl_c))  # (8, CHUNK)
            ids = sub_iota + cb * CHUNK            # (CHUNK, LANES)
            onehot = (ids == pidx_r).astype(f32)
            return acc + jax.lax.dot(
                vals, onehot, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32)

        acc = jax.lax.fori_loop(0, cnum_ref[0, i * RSTEP + rr],
                                chunk_body,
                                jnp.zeros((8, LANES), f32))
        byte_rows.append(acc[0:1, :])
        base_rows.append(acc[1:2, :])
    node_byte = jnp.concatenate(byte_rows, axis=0).astype(jnp.int32)
    child_base = jnp.concatenate(base_rows, axis=0).astype(jnp.int32)

    # ---- parent state --------------------------------------------------
    pidx = pidx_ref[:, :]
    ridx = ridx_ref[:, :]
    xy = xy_ref[:, :]
    zz = zz_ref[:, :]
    key = key_ref[:, :]
    valid = pidx >= 0

    r = dt(1.0 / (1 << l))
    rc = dt(r * 0.5)
    px = ((xy >> 16) & 0xFFFF).astype(dt)
    py = (xy & 0xFFFF).astype(dt)
    pz = zz.astype(dt)
    vcx = r * (2. * px + 1.) - 1.
    vcy = r * (2. * py + 1.) - 1.
    vcz = r * (2. * pz + 1.) - 1.

    if ray_fn_cols is not None:
        ox, oy, oz, dx, dy, dz = ray_fn_cols(ridx)
        ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    else:
        # xla_rays mode: o, d, 1/d computed per level by XLA (the same
        # graph as the XLA traversal path — bit-identical values) and
        # streamed in as 9 extra frontier planes
        ox, oy, oz = (ray_refs[a][:, :] for a in range(3))
        dx, dy, dz = (ray_refs[a][:, :] for a in range(3, 6))
        ivx, ivy, ivz = (ray_refs[a][:, :] for a in range(6, 9))
    # signbit(x) ? 1 : -1
    sx = jnp.where(jnp.signbit(dx), dt(1.), dt(-1.))
    sy = jnp.where(jnp.signbit(dy), dt(1.), dt(-1.))
    sz = jnp.where(jnp.signbit(dz), dt(1.), dt(-1.))
    if with_exit and last:
        ex_ = jnp.where(jnp.signbit(-dx), dt(1.), dt(-1.))
        ey_ = jnp.where(jnp.signbit(-dy), dt(1.), dt(-1.))
        ez_ = jnp.where(jnp.signbit(-dz), dt(1.), dt(-1.))

    # ray-origin octant code (raytrace_cuda.cu:252-259)
    fx = (0.5 * ox + 0.5) - r * (px + 0.5)
    fy = (0.5 * oy + 0.5) - r * (py + 0.5)
    fz = (0.5 * oz + 0.5) - r * (pz + 0.5)
    code = ((fx > 0).astype(jnp.int32) * 4 + (fy > 0).astype(jnp.int32) * 2
            + (fz > 0).astype(jnp.int32))

    # ---- per-octant candidate planes (octant ascending = id order) -----
    planes = []        # per octant: dict of field tiles
    for s in range(8):
        exists = ((node_byte >> s) & 1) > 0
        sxo, syo, szo = (s >> 2) & 1, (s >> 1) & 1, s & 1
        ccx = vcx - rc + r * dt(sxo)
        ccy = vcy - rc + r * dt(syo)
        ccz = vcz - rc + r * dt(szo)
        entry = _ray_cols_aabb(ox, oy, oz, dx, dy, dz, ivx, ivy, ivz,
                               sx, sy, sz, ccx, ccy, ccz, rc)
        if last:
            hit = entry > 0.
            if with_exit:
                exit_ = _ray_cols_aabb(ox, oy, oz, dx, dy, dz,
                                       ivx, ivy, ivz, ex_, ey_, ez_,
                                       ccx, ccy, ccz, rc)
                hit &= exit_ > 0.
        else:
            hit = entry != 0.
        keep = exists & hit & valid
        # inclusive prefix popcount, matching the XLA path and the
        # reference (raytrace_cuda.cu): child id = exsum[p] + popcount
        # of bits 0..s of the parent byte
        cnt_before = jnp.bitwise_count(
            (node_byte & ((2 << s) - 1)).astype(jnp.uint32)
        ).astype(jnp.int32)
        # near-to-far rank of this octant for this ray: _VOXEL_RANK[code][s]
        rank = jnp.zeros_like(code)
        for c in range(8):
            rank = jnp.where(code == c, jnp.int32(_VOXEL_RANK[c][s]), rank)
        fields = {
            'pidx': jnp.where(keep, child_base + cnt_before, -1),
            'ridx': ridx,
            'key': key * 8 + rank,
        }
        if last:
            fields['ent'] = entry
            if with_exit:
                fields['ext'] = exit_
        else:
            fields['xy'] = (xy << 1) | (sxo << 16) | syo
            fields['zz'] = (zz << 1) | szo
        planes.append(fields)

    # ---- stable slot-packing: survivors to low slots -------------------
    # odd-even transposition on the 8 octant planes; a swap only fires
    # when (low = dead, high = alive), so alive relative (id) order is
    # preserved. 8 rounds close any gap pattern.
    # slot-packing matters only when the glue sorts a slot prefix
    # (smax_sort < 8): survivors must sit in the low slots. With all 8
    # planes sorted, octant-order holes are already ascending-with-holes.
    names = list(planes[0].keys())
    for _round in range(8 if pack else 0):
        start = _round % 2
        for a in range(start, 7, 2):
            b = a + 1
            dead_a = planes[a]['pidx'] < 0
            alive_b = planes[b]['pidx'] >= 0
            w = dead_a & alive_b
            for nm in names:
                va, vb = planes[a][nm], planes[b][nm]
                planes[a][nm] = jnp.where(w, vb, va)
                planes[b][nm] = jnp.where(w, va, vb)

    # ---- write slotted output: out row = inrow * 8 + slot --------------
    out = dict(zip(['pidx', 'ridx', 'key', 'xy', 'zz', 'ent', 'ext'],
                   out_refs))
    for s in range(8):
        for nm in names:
            ref = out[nm]
            for rr in range(RSTEP):
                ref[rr * 8 + s, :] = planes[s][nm][rr, :]


def make_level_call(l, steps, last, with_exit, ray_fn_cols, npad,
                    interpret=False, pack=True):
    """pallas_call for one traversal level over ``steps`` grid steps
    (8 frontier rows each). ``ray_fn_cols=None`` selects xla_rays mode:
    nine extra (rows, 128) f32 inputs carry o / d / 1-over-d planes."""
    xla_rays = ray_fn_cols is None
    rows = steps * RSTEP
    i32 = jnp.int32
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((rows * 8, LANES), i32)  # pidx
                  ] + [jax.ShapeDtypeStruct((rows * 8, LANES), i32)] * 2
    # order: pidx, ridx, key, then xy/zz (mid) or ent/ext (last)
    if last:
        out_shapes.append(jax.ShapeDtypeStruct((rows * 8, LANES), f32))
        if with_exit:
            out_shapes.append(jax.ShapeDtypeStruct((rows * 8, LANES), f32))
    else:
        out_shapes += [jax.ShapeDtypeStruct((rows * 8, LANES), i32)] * 2

    nouts = len(out_shapes)

    def kernel(wblk_ref, cbase_ref, cnum_ref,
               pidx_ref, ridx_ref, xy_ref, zz_ref, key_ref,
               *rest):
        if xla_rays:
            ray_refs = rest[:9]
            tbl_a, tbl_b, tbl_c = rest[9:12]
            outs = rest[12:]
        else:
            ray_refs = None
            tbl_a, tbl_b, tbl_c = rest[0:3]
            outs = rest[3:]
        # reorder outs into the body's fixed slot layout
        named = {}
        named['pidx'], named['ridx'], named['key'] = outs[0], outs[1], outs[2]
        if last:
            named['ent'] = outs[3]
            named['xy'] = named['zz'] = None
            if with_exit:
                named['ext'] = outs[4]
            else:
                named['ext'] = None
        else:
            named['xy'], named['zz'] = outs[3], outs[4]
            named['ent'] = named['ext'] = None
        _level_kernel_body(l, last, with_exit, ray_fn_cols, ray_refs,
                           pack,
                           wblk_ref, cbase_ref, cnum_ref,
                           pidx_ref, ridx_ref, xy_ref, zz_ref, key_ref,
                           tbl_a, tbl_b, tbl_c,
                           named['pidx'], named['ridx'], named['key'],
                           named['xy'], named['zz'],
                           named['ent'], named['ext'])

    frontier_spec = pl.BlockSpec((RSTEP, LANES), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
    nblk = npad // W_BLK

    def tbl_map_a(i, wblk_ref, cbase_ref, cnum_ref):
        return (0, wblk_ref[0, i])

    def tbl_map_b(i, wblk_ref, cbase_ref, cnum_ref):
        return (0, jnp.minimum(wblk_ref[0, i] + 1, nblk - 1))

    def tbl_map_c(i, wblk_ref, cbase_ref, cnum_ref):
        return (0, jnp.minimum(wblk_ref[0, i] + 2, nblk - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[frontier_spec] * (14 if xla_rays else 5) + [
            pl.BlockSpec((8, W_BLK), tbl_map_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W_BLK), tbl_map_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W_BLK), tbl_map_c, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((RSTEP * 8, LANES), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)] * nouts,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


def _prepass(pidx_rows, nblk, rstep=RSTEP):
    """Window/chunk schedule for a (rows, 128) frontier: per-step table
    block index, per-row chunk base/count, and a coverage-overflow flag
    (a step's ids must fit the two fetched blocks). Empty rows get a
    zero chunk count and are excluded from the step window."""
    valid = pidx_rows >= 0
    rmin = jnp.min(jnp.where(valid, pidx_rows, _INT_MAX), axis=1)
    rmax = jnp.max(jnp.where(valid, pidx_rows, -1), axis=1)
    empty = rmax < 0
    smin = jnp.min(rmin.reshape(-1, rstep), axis=1)    # INT_MAX if all empty
    smax = jnp.max(rmax.reshape(-1, rstep), axis=1)
    wblk = jnp.clip(smin // W_BLK, 0, nblk - 2)
    covered = (smax < (wblk + 3) * W_BLK) | (smax < 0)
    overflow = jnp.sum(jnp.logical_not(covered).astype(jnp.int32))
    cbase = jnp.clip(jnp.where(empty, 0, rmin // CHUNK), 0,
                     nblk * (W_BLK // CHUNK) - 1)
    cnum = jnp.where(empty, 0, rmax // CHUNK - cbase + 1)
    active = smax >= 0                 # any live parent in the step
    return (wblk.reshape(1, -1).astype(jnp.int32),
            cbase.reshape(1, -1).astype(jnp.int32),
            cnum.reshape(1, -1).astype(jnp.int32),
            overflow,
            active.reshape(1, -1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    'num_rays', 'level', 'schedule', 'with_exit', 'ray_fn_cols',
    'ray_fn', 'interpret', 'smax_sort', 'debug_no_append',
    'debug_no_final_sort'))
def traverse_banded(tbl_t, num_rays, level, schedule, ray_fn_cols=None,
                    ray_fn=None, origin=None, direction=None,
                    with_exit=False, interpret=False, smax_sort=8,
                    debug_no_append=False, debug_no_final_sort=False):
    """Full SPC traversal on the banded-frontier Pallas kernel.

    Args:
        tbl_t: (8, Npad) f32 transposed node table
            (:func:`build_node_table_t`).
        num_rays: ray count (static); rays come from ``ray_fn_cols``.
        level (int): target octree level (<= 10: the carried path key
            packs 3 bits per level into an int32).
        schedule: static per-level tuple ``(rows_s0... )`` — entry l is
            ``(append_rows_l,)`` capacity of rows appended after level
            l's slot-sort (level ``level-1`` entry sizes the final
            buffer); from :func:`plan_traverse_banded`.
        ray_fn_cols: static callable ``ridx tile -> (ox, oy, oz, dx,
            dy, dz)`` tiles — componentwise ray recompute, traced into
            the kernel (fastest; Mosaic's own sqrt/divide rounding).
        ray_fn: static row-form closure (``primary_rays_fn``) — rays
            and reciprocals are recomputed per level by XLA (the same
            graph as the XLA path, so slab inputs are bit-identical to
            it) and streamed into the kernel as extra planes.
        origin, direction: (num_rays, 3) arrays — the general API;
            per-level XLA gathers by ray index feed the kernel.
            Exactly one ray source must be given.
        with_exit: also return exit depths.
        interpret: run the kernels in interpreter mode (CPU tests).

    Returns:
        (ridx, pidx, depth (N, 1|2), count, overflow) — N = final
        capacity; valid prefix of length ``min(count, N)`` in the
        reference's exact order (ray-major, near-to-far DFS).
    """
    assert level >= 1 and level <= 10, level
    assert (ray_fn_cols is not None) + (ray_fn is not None) + \
        (origin is not None) == 1, 'give exactly one ray source'
    npad = tbl_t.shape[1]
    nblk = npad // W_BLK

    def ray_planes(ridx):
        """(o, d, 1/d) planes from the XLA-side ray source."""
        rid = ridx.reshape(-1)
        if ray_fn is not None:
            o_rows, d_rows = ray_fn(rid)
        else:
            ci = jnp.clip(rid, 0, origin.shape[0] - 1)
            o_rows, d_rows = origin[ci], direction[ci]
        iv_rows = 1.0 / d_rows
        shape = ridx.shape
        return tuple(a[:, c].reshape(shape)
                     for a in (o_rows, d_rows, iv_rows) for c in range(3))

    r0 = -(-num_rays // LANES)
    r0 = -(-r0 // RSTEP) * RSTEP
    lane_iota = jnp.arange(r0 * LANES, dtype=jnp.int32).reshape(r0, LANES)
    in_range = lane_iota < num_rays
    pidx = jnp.where(in_range, 0, -1)
    ridx = jnp.where(in_range, lane_iota, 0)
    xy = jnp.zeros((r0, LANES), jnp.int32)
    zz = jnp.zeros((r0, LANES), jnp.int32)
    key = jnp.zeros((r0, LANES), jnp.int32)

    overflow = jnp.int32(0)
    for l in range(level):
        last = l == level - 1
        rows = pidx.shape[0]
        steps = rows // RSTEP
        wblk, cbase, cnum, oflow, _active = _prepass(pidx, nblk)
        overflow += oflow
        call = make_level_call(l, steps, last, with_exit, ray_fn_cols,
                               npad, interpret, pack=smax_sort < 8)
        if ray_fn_cols is None:
            outs = call(wblk, cbase, cnum, pidx, ridx, xy, zz, key,
                        *ray_planes(ridx), tbl_t, tbl_t, tbl_t)
        else:
            outs = call(wblk, cbase, cnum, pidx, ridx, xy, zz, key,
                        tbl_t, tbl_t, tbl_t)
        o_pidx, o_ridx, o_key = outs[0], outs[1], outs[2]
        if last:
            o_ent = outs[3]
            o_ext = outs[4] if with_exit else None
            o_xy = o_zz = None
        else:
            o_xy, o_zz = outs[3], outs[4]
            o_ent = o_ext = None

        # ---- full re-densify: ONE sort per level -------------------------
        # Sorting all slotted-output slots by child id compacts AND
        # re-sorts the whole frontier, so the next level starts dense
        # (fewer kernel rows), globally id-sorted (narrow windows), and
        # free of slot-lineage span growth. Measured on this backend
        # (BASELINE.md): sort cost is ~3 ms fixed + ~0.5 ns/row and does
        # NOT depend on input order — so the slot planes are sorted in
        # their native layout (no interleave transposes: each (rows, 8,
        # 128) -> (rows, 128, 8) relayout costs another ~3 ms fixed).
        # Ties (one node hit by many rays) land arbitrarily; the final
        # (ray, path_key) sort fixes output order. Survivors in planes
        # past smax_sort raise the overflow flag (a parent with more
        # than smax_sort surviving children; smax_sort=8 never does).
        def interleave(a):
            return a.reshape(rows, 8, LANES)[:, :smax_sort].reshape(-1)

        if smax_sort < 8:
            hi = o_pidx.reshape(rows, 8, LANES)[:, smax_sort:]
            overflow += jnp.sum((hi >= 0).astype(jnp.int32))
        cols = [o_ridx, o_key]
        if last:
            cols.append(o_ent)
            if with_exit:
                cols.append(o_ext)
        else:
            cols += [o_xy, o_zz]
        p_all = interleave(o_pidx)
        cols = [interleave(c) for c in cols]

        kcap = (int(schedule[l]) if schedule is not None
                else rows * smax_sort)
        kcap = min(kcap, rows * smax_sort)
        if debug_no_append:
            kcap = min(kcap, rows)
            keep = [p_all[:kcap * LANES]] + [c[:kcap * LANES]
                                             for c in cols]
        else:
            sort_key = jnp.where(p_all < 0, _INT_MAX, p_all)
            sorted_ops = jax.lax.sort(
                (sort_key, p_all) + tuple(cols), num_keys=1,
                is_stable=False)
            kept = jnp.sum((sorted_ops[0] != _INT_MAX).astype(jnp.int32))
            overflow += jnp.maximum(kept - kcap * LANES, 0)
            keep = [op[:kcap * LANES] for op in sorted_ops[1:]]

        # next-level frontier rows (multiple of RSTEP for the grid)
        rows_n = -(-kcap // RSTEP) * RSTEP
        pad = rows_n * LANES - kcap * LANES

        def to_rows(a, fill):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,), fill, a.dtype)])
            return a.reshape(rows_n, LANES)

        pidx = to_rows(keep[0], -1)
        ridx = to_rows(keep[1], 0)
        key = to_rows(keep[2], 0)
        if last:
            ent = to_rows(keep[3], 0.)
            ext = to_rows(keep[4], 0.) if with_exit else None
        else:
            xy = to_rows(keep[3], 0)
            zz = to_rows(keep[4], 0)

    # ---- final: restore the reference's exact output order -------------
    valid = pidx >= 0
    count = jnp.sum(valid.astype(jnp.int32))
    frid = jnp.where(valid, ridx, _INT_MAX).reshape(-1)
    fkey = jnp.where(valid, key, _INT_MAX).reshape(-1)
    ops = [frid, fkey, pidx.reshape(-1), ridx.reshape(-1), ent.reshape(-1)]
    if with_exit:
        ops.append(ext.reshape(-1))
    if debug_no_final_sort:
        so = tuple(ops)
    else:
        so = jax.lax.sort(tuple(ops), num_keys=2, is_stable=False)
    n = so[2].shape[0]
    fin_valid = so[0] != _INT_MAX
    out_ridx = jnp.where(fin_valid, so[3], -1)
    out_pidx = jnp.where(fin_valid, so[2], -1)
    depth_cols = [jnp.where(fin_valid, so[4], 0.)]
    if with_exit:
        depth_cols.append(jnp.where(fin_valid, so[5], 0.))
    depth = jnp.stack(depth_cols, axis=-1)
    return out_ridx, out_pidx, depth, count, overflow


def schedule_from_counts(counts, margin=1.25):
    """Static append-row schedule for :func:`traverse_banded` from the
    per-level intersection counts a :func:`plan_raytrace` probe
    observed: level l appends at most all of level l+1's survivors
    (slot-0 keeps the rest in place), so ``ceil(count * margin / 128)``
    rows bound the append with headroom."""
    return tuple(int(-(-int(c * margin) // LANES)) for c in counts)


# ---------------------------------------------------------------------------
# Cursor-compaction traversal: the per-level re-densify sorts (measured
# ~90% of the banded path's runtime at 512^2/L10 — ~134 of 146 ms,
# 2026-08-21 ablation) are replaced by in-kernel compaction. Each
# sequential grid step compacts its survivors to row granularity with
# one-hot MXU matmuls (positions from triangular-matmul prefix sums)
# and DMAs a static 256-row block to the HBM output at a dynamic row
# cursor held in SMEM; successive steps overlap-overwrite the previous
# step's padding tail, so the frontier emerges dense without any sort.
#
# Why no sort is needed: candidates are emitted in (row, lane, octant)
# order and children of ascending parent ids occupy ascending id ranges
# (exsum is monotone), so cursor order IS id order up to per-parent
# ties — and ties never widen a step's table window. Parent coords are
# NOT carried: they ride rows 2-4 of the node table and come back
# through the same windowed one-hot gather as the byte/child-base
# words, shrinking the carried state to (pidx, ridx, key_hi, key_lo).
# The path key is split hi/lo (levels 0-4 / 5-9) so every carried value
# stays < 2**24 and exact through the f32 compaction matmuls.

_KEY_SPLIT = 5          # key_hi takes levels < split, key_lo the rest


def _cc_gather(i, rr, pidx_row, cbase_ref, cnum_ref, wblk,
               tbl_a, tbl_b, tbl_c, rstep=RSTEP):
    """Windowed one-hot gather of one frontier row's node words:
    returns (8, LANES) f32 [byte, child_base, px, py, pz, 0, 0, 0]."""
    f32 = jnp.float32
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 0)
    pidx_r = pidx_row.reshape(1, LANES)

    def chunk_body(k, acc):
        cb = cbase_ref[0, i * rstep + rr] + k
        off_a = cb * CHUNK - wblk * W_BLK
        in_a = off_a < W_BLK
        in_b = off_a < 2 * W_BLK
        ds_a = pl.multiple_of(jnp.clip(off_a, 0, W_BLK - CHUNK), CHUNK)
        ds_b = pl.multiple_of(jnp.clip(off_a - W_BLK, 0,
                                       W_BLK - CHUNK), CHUNK)
        ds_c = pl.multiple_of(jnp.clip(off_a - 2 * W_BLK, 0,
                                       W_BLK - CHUNK), CHUNK)
        sl_a = tbl_a[:, pl.ds(ds_a, CHUNK)]
        sl_b = tbl_b[:, pl.ds(ds_b, CHUNK)]
        sl_c = tbl_c[:, pl.ds(ds_c, CHUNK)]
        vals = jnp.where(in_a, sl_a, jnp.where(in_b, sl_b, sl_c))
        ids = sub_iota + cb * CHUNK
        onehot = (ids == pidx_r).astype(f32)
        return acc + jax.lax.dot(
            vals, onehot, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)

    return jax.lax.fori_loop(0, cnum_ref[0, i * rstep + rr], chunk_body,
                             jnp.zeros((8, LANES), f32))


def _cc_kernel_body(l, last, with_exit, ray_fn_cols, ray_refs, cap_rows,
                    active_ref, wblk_ref, cbase_ref, cnum_ref,
                    pidx_ref, ridx_ref, khi_ref, klo_ref,
                    tbl_a, tbl_b, tbl_c,
                    out_refs, meta_ref, stage_refs, cursor_ref, sems,
                    rstep=RSTEP, emit_rays=False,
                    merge_rots=(1, 37, 77), merge_lo=2):
    i = pl.program_id(0)
    f32 = jnp.float32
    dt = f32

    @pl.when(i == 0)
    def _():
        cursor_ref[0, 0] = 0
        meta_ref[0, 0] = 0

    @pl.when(active_ref[0, i] > 0)
    def _body():
        wblk = wblk_ref[0, i]
        byte_rows, base_rows = [], []
        pxr, pyr, pzr = [], [], []
        for rr in range(rstep):
            acc = _cc_gather(i, rr, pidx_ref[rr, :], cbase_ref, cnum_ref,
                             wblk, tbl_a, tbl_b, tbl_c, rstep)
            byte_rows.append(acc[0:1, :])
            base_rows.append(acc[1:2, :])
            pxr.append(acc[2:3, :])
            pyr.append(acc[3:4, :])
            pzr.append(acc[4:5, :])
        node_byte = jnp.concatenate(byte_rows, axis=0).astype(jnp.int32)
        child_base = jnp.concatenate(base_rows, axis=0).astype(jnp.int32)
        px = jnp.concatenate(pxr, axis=0)
        py = jnp.concatenate(pyr, axis=0)
        pz = jnp.concatenate(pzr, axis=0)

        pidx = pidx_ref[:, :]
        ridx = ridx_ref[:, :]
        khi = khi_ref[:, :]
        klo = klo_ref[:, :]
        valid = pidx >= 0

        r = dt(1.0 / (1 << l))
        rc = dt(r * 0.5)
        vcx = r * (2. * px + 1.) - 1.
        vcy = r * (2. * py + 1.) - 1.
        vcz = r * (2. * pz + 1.) - 1.

        if ray_fn_cols is not None:
            ox, oy, oz, dx, dy, dz = ray_fn_cols(ridx)
            ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        else:
            ox, oy, oz = (ray_refs[a][:, :] for a in range(3))
            dx, dy, dz = (ray_refs[a][:, :] for a in range(3, 6))
            ivx, ivy, ivz = (ray_refs[a][:, :] for a in range(6, 9))
        sx = jnp.where(jnp.signbit(dx), dt(1.), dt(-1.))
        sy = jnp.where(jnp.signbit(dy), dt(1.), dt(-1.))
        sz = jnp.where(jnp.signbit(dz), dt(1.), dt(-1.))
        if with_exit and last:
            ex_ = jnp.where(jnp.signbit(-dx), dt(1.), dt(-1.))
            ey_ = jnp.where(jnp.signbit(-dy), dt(1.), dt(-1.))
            ez_ = jnp.where(jnp.signbit(-dz), dt(1.), dt(-1.))

        fx = (0.5 * ox + 0.5) - r * (px + 0.5)
        fy = (0.5 * oy + 0.5) - r * (py + 0.5)
        fz = (0.5 * oz + 0.5) - r * (pz + 0.5)
        code = ((fx > 0).astype(jnp.int32) * 4
                + (fy > 0).astype(jnp.int32) * 2
                + (fz > 0).astype(jnp.int32))

        planes = []
        for s in range(8):
            exists = ((node_byte >> s) & 1) > 0
            sxo, syo, szo = (s >> 2) & 1, (s >> 1) & 1, s & 1
            ccx = vcx - rc + r * dt(sxo)
            ccy = vcy - rc + r * dt(syo)
            ccz = vcz - rc + r * dt(szo)
            entry = _ray_cols_aabb(ox, oy, oz, dx, dy, dz, ivx, ivy, ivz,
                                   sx, sy, sz, ccx, ccy, ccz, rc)
            if last:
                hit = entry > 0.
                if with_exit:
                    exit_ = _ray_cols_aabb(ox, oy, oz, dx, dy, dz,
                                           ivx, ivy, ivz, ex_, ey_, ez_,
                                           ccx, ccy, ccz, rc)
                    hit &= exit_ > 0.
            else:
                hit = entry != 0.
            keep = exists & hit & valid
            cnt_before = jnp.bitwise_count(
                (node_byte & ((2 << s) - 1)).astype(jnp.uint32)
            ).astype(jnp.int32)
            rank = jnp.zeros_like(code)
            for c in range(8):
                rank = jnp.where(code == c, jnp.int32(_VOXEL_RANK[c][s]),
                                 rank)
            fields = {'pidx': jnp.where(keep, child_base + cnt_before, -1),
                      'ridx': ridx}
            if l < _KEY_SPLIT:
                fields['khi'] = khi * 8 + rank
                fields['klo'] = klo
            else:
                fields['khi'] = khi
                fields['klo'] = klo * 8 + rank
            if emit_rays and not last:
                # carried-rays mode: each surviving child inherits its
                # parent's ray planes, compacted losslessly alongside
                # the rest of the state (a one-hot f32 matmul moves any
                # native f32 bit pattern exactly: one product is v * 1,
                # the rest are v * 0)
                fields['ox'], fields['oy'], fields['oz'] = ox, oy, oz
                fields['dx'], fields['dy'], fields['dz'] = dx, dy, dz
            if last:
                fields['ent'] = entry
                if with_exit:
                    fields['ext'] = exit_
            planes.append(fields)

        # stable slot-packing: survivors to low slots per parent column
        # (odd-even transposition over the 8 octant planes; a swap only
        # fires when low is dead and high alive, preserving id order)
        names = list(planes[0].keys())
        for _round in range(8):
            start = _round % 2
            for a in range(start, 7, 2):
                b = a + 1
                w = (planes[a]['pidx'] < 0) & (planes[b]['pidx'] >= 0)
                for nm in names:
                    va, vb = planes[a][nm], planes[b][nm]
                    planes[a][nm] = jnp.where(w, vb, va)
                    planes[b][nm] = jnp.where(w, va, vb)

        # lane-rotation merges: without these, dead lanes compound level
        # over level (kept rows inherit their holes, measured density
        # decays 0.87 -> 0.47 -> ~0.22 by level 3 at 256^2/L8) and the
        # frontier blows up ~4x. Moving survivors from high slot planes
        # into dead lanes of LOW planes at rotated offsets re-densifies:
        # output order is free (final (ray, key) sort) and the move
        # stays within its parent row, so window spans are unchanged.
        def merge(hi, lo, rot):
            rolled = {nm: pltpu.roll(planes[hi][nm], rot, 1)
                      for nm in names}
            w = (planes[lo]['pidx'] < 0) & (rolled['pidx'] >= 0)
            for nm in names:
                planes[lo][nm] = jnp.where(w, rolled[nm], planes[lo][nm])
            # roll in i32: Mosaic's rotate has no i1 lowering
            back = pltpu.roll(w.astype(jnp.int32), LANES - rot, 1) > 0
            planes[hi]['pidx'] = jnp.where(back, -1, planes[hi]['pidx'])

        for rot in merge_rots:
            for hi in range(7, 0, -1):
                for lo in range(min(hi, merge_lo)):
                    merge(hi, lo, rot + hi + lo)

        # ---- row-granular compaction positions --------------------------
        # output order is (parent-row, slot): an output step's rows then
        # hold children of only ~4 parent rows, keeping window spans
        # tight. All prefix math is exact f32 matmuls (values < 2**24).
        tri_ex = (jax.lax.broadcasted_iota(jnp.int32, (rstep, rstep), 1) <
                  jax.lax.broadcasted_iota(jnp.int32, (rstep, rstep), 0)
                  ).astype(f32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (rstep, rstep), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (rstep, rstep), 1)
               ).astype(f32)
        valid_cols = []
        for s in range(8):
            alive = (planes[s]['pidx'] >= 0).astype(f32)
            rowcnt = jnp.sum(alive, axis=1, keepdims=True)   # (RSTEP, 1)
            valid_cols.append((rowcnt > 0.).astype(f32))
        cnt8 = valid_cols[0]
        for s in range(1, 8):
            cnt8 = cnt8 + valid_cols[s]
        rowpre = jax.lax.dot(tri_ex, cnt8,
                             precision=jax.lax.Precision.HIGHEST)
        pos_cols = []
        run = rowpre
        for s in range(8):
            pos_cols.append(run)
            run = run + valid_cols[s]
        posmat = jnp.concatenate(pos_cols, axis=1)           # (RSTEP, 8)
        vmat = jnp.concatenate(valid_cols, axis=1)
        posr = jax.lax.dot_general(posmat, eye, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)
        vr = jax.lax.dot_general(vmat, eye, (((0,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        # posr/vr: (8, RSTEP)

        used_f = jnp.sum(cnt8)
        io0 = jax.lax.broadcasted_iota(jnp.int32, (rstep * 8, rstep), 0)
        # ONE wide one-hot dot per octant: all fields concatenated along
        # lanes share the slot-plane's scatter matrix (identical math to
        # per-field dots — each output element is still v*1 + zeros —
        # with nfields-x fewer MXU issues per step)
        outs_c = jnp.zeros((rstep * 8, len(names) * LANES), f32)
        for s in range(8):
            st = ((io0 == posr[s:s + 1].astype(jnp.int32))
                  & (vr[s:s + 1] > 0.5)).astype(f32)         # (256, RSTEP)
            fc = jnp.concatenate(
                [planes[s][nm].astype(f32) for nm in names], axis=1)
            outs_c = outs_c + jax.lax.dot(
                st, fc, precision=jax.lax.Precision.HIGHEST)
        outs = {nm: outs_c[:, i * LANES:(i + 1) * LANES]
                for i, nm in enumerate(names)}

        for nm, stage in zip(names, stage_refs):
            if nm in ('ent', 'ext', 'ox', 'oy', 'oz', 'dx', 'dy', 'dz'):
                stage[:, :] = outs[nm]
            else:
                stage[:, :] = outs[nm].astype(jnp.int32)

        # ---- cursor + overlapping DMA -----------------------------------
        cur = cursor_ref[0, 0]
        cur_c = jnp.minimum(cur, cap_rows)     # clamp: no OOB on overflow
        copies = []
        for f, (stage, outr) in enumerate(zip(stage_refs, out_refs)):
            cp = pltpu.make_async_copy(
                stage, outr.at[pl.ds(cur_c, rstep * 8), :], sems[f])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()
        new_cur = cur + used_f.astype(jnp.int32)
        cursor_ref[0, 0] = new_cur
        meta_ref[0, 0] = new_cur


def _cc_level_call(l, steps, last, with_exit, ray_fn_cols, npad, cap_rows,
                   interpret=False, rstep=RSTEP, emit_rays=False,
                   merge_rots=(1, 37, 77), merge_lo=2):
    """pallas_call for one cursor-compaction traversal level."""
    xla_rays = ray_fn_cols is None
    i32 = jnp.int32
    f32 = jnp.float32
    n_ray = 6 if (emit_rays and not last) else 0
    nfields = 4 + n_ray + (1 + int(with_exit) if last else 0)
    buf_rows = cap_rows + rstep * 8
    out_shapes = [jax.ShapeDtypeStruct((buf_rows, LANES), i32)] * 4
    out_shapes += [jax.ShapeDtypeStruct((buf_rows, LANES), f32)] * n_ray
    if last:
        out_shapes.append(jax.ShapeDtypeStruct((buf_rows, LANES), f32))
        if with_exit:
            out_shapes.append(jax.ShapeDtypeStruct((buf_rows, LANES), f32))
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), i32))     # meta: total

    def kernel(active_ref, wblk_ref, cbase_ref, cnum_ref,
               pidx_ref, ridx_ref, khi_ref, klo_ref, *rest):
        if xla_rays:
            ray_refs = rest[:9]
            tbl_a, tbl_b, tbl_c = rest[9:12]
            rest = rest[12:]
        else:
            ray_refs = None
            tbl_a, tbl_b, tbl_c = rest[0:3]
            rest = rest[3:]
        out_refs = rest[:nfields]
        meta_ref = rest[nfields]
        stage_refs = rest[nfields + 1:nfields + 1 + nfields]
        cursor_ref = rest[nfields + 1 + nfields]
        sems = rest[nfields + 2 + nfields:]
        _cc_kernel_body(l, last, with_exit, ray_fn_cols, ray_refs,
                        cap_rows,
                        active_ref, wblk_ref, cbase_ref, cnum_ref,
                        pidx_ref, ridx_ref, khi_ref, klo_ref,
                        tbl_a, tbl_b, tbl_c,
                        out_refs, meta_ref, stage_refs, cursor_ref, sems,
                        rstep, emit_rays, merge_rots, merge_lo)

    frontier_spec = pl.BlockSpec((rstep, LANES), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
    nblk = npad // W_BLK

    def tbl_map_a(i, active_ref, wblk_ref, cbase_ref, cnum_ref):
        return (0, wblk_ref[0, i])

    def tbl_map_b(i, active_ref, wblk_ref, cbase_ref, cnum_ref):
        return (0, jnp.minimum(wblk_ref[0, i] + 1, nblk - 1))

    def tbl_map_c(i, active_ref, wblk_ref, cbase_ref, cnum_ref):
        return (0, jnp.minimum(wblk_ref[0, i] + 2, nblk - 1))

    stage_types = ([pltpu.VMEM((rstep * 8, LANES), i32)] * 4
                   + ([pltpu.VMEM((rstep * 8, LANES), f32)]
                      * (nfields - 4)))  # ray/depth stages are all f32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(steps,),
        in_specs=[frontier_spec] * (13 if xla_rays else 4) + [
            pl.BlockSpec((8, W_BLK), tbl_map_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W_BLK), tbl_map_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W_BLK), tbl_map_c, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nfields + [
            pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=stage_types + [pltpu.SMEM((1, 1), i32)] + [
            pltpu.SemaphoreType.DMA] * nfields,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=(
    'num_rays', 'level', 'schedule', 'with_exit', 'ray_fn_cols',
    'ray_fn', 'interpret', 'return_rows', 'level_offsets',
    'margin_dense', 'raw_factor', 'raw_rows', 'max_sortfree_chain',
    'rstep', 'carry_rays', 'merge_rots', 'merge_lo'))
def traverse_banded_cc(tbl_t, num_rays, level, schedule, ray_fn_cols=None,
                       ray_fn=None, origin=None, direction=None,
                       with_exit=False, interpret=False,
                       return_rows=False, level_offsets=None,
                       margin_dense=1.2, raw_factor=6, raw_rows=None,
                       max_sortfree_chain=3, rstep=RSTEP,
                       carry_rays=None, merge_rots=(1, 37, 77),
                       merge_lo=2):
    """Full SPC traversal with in-kernel cursor compaction.

    Hybrid sort policy: in-kernel cursor compaction removes the 8x
    octant-slot sparsity every level; an XLA re-densify sort runs ONLY
    before levels whose node-table slice exceeds the guaranteed window
    coverage (2*W_BLK ids, decided statically from ``level_offsets``).
    Shallow levels are always covered regardless of frontier order (a
    slice <= 2*W_BLK fits any 3-block fetch), so they pay no sort at
    all; deep levels sort a frontier that compaction has already shrunk
    ~5x versus the slotted layout. Without ``level_offsets`` every mid
    level sorts (safe default).

    Same contract as :func:`traverse_banded`; ``tbl_t`` must be built
    with ``point_hierarchy`` (node coords in rows 2-4). ``schedule`` is
    the static per-level NUGGET COUNT tuple from a
    :func:`render.spc.raytrace.plan_raytrace` probe (or None for the
    worst-case 8x-growth bound); ``margin_dense`` sizes the post-sort
    dense frontier, ``raw_factor`` the kernel's sparse output headroom
    over it (row-granular compaction keeps partially-dead rows; the
    measured sort-free-chain density floor ~0.18 needs the 6x default —
    pass probe-measured ``raw_rows`` to run tight instead).

    ``carry_rays``: None (auto — origin/direction arrays carry their 6
    o/d planes THROUGH the kernel as compacted frontier fields, ray_fn
    streams recomputed planes), True (force carrying even for ray_fn),
    or False (legacy array mode: per-level XLA row gathers by compacted
    ray index — ~8.6 ns/el x 9 planes x frontier size per level, the
    round-4 array-mode tax; kept for A/B measurement). In carry mode
    ``1/d`` is still computed per level by XLA from the carried ``d``
    planes (elementwise — bit-identical to the XLA path's per-level
    ``inv``), so slab inputs and therefore nugget sets, order, and
    depths remain bit-exact vs ``backend='xla'``.

    Returns (ridx, pidx, depth (N, 1|2), count, overflow[, row_totals]).
    """
    assert level >= 1 and level <= 10, level
    assert num_rays < (1 << 24), num_rays
    assert (ray_fn_cols is not None) + (ray_fn is not None) + \
        (origin is not None) == 1, 'give exactly one ray source'
    if carry_rays is None:
        carry_rays = origin is not None
    carry = carry_rays and ray_fn_cols is None
    npad = tbl_t.shape[1]
    nblk = npad // W_BLK

    last_sorted = [0]

    def needs_sort(nl):
        """Sort the frontier feeding level ``nl``'s gather? Required
        when the level's table slice exceeds the guaranteed window
        coverage; optionally also when the sort-free chain exceeds
        ``max_sortfree_chain`` levels (lane sparsity compounds ~0.6x
        per unsorted level — a mid-chain sort resets density; measured
        sweep at 512^2/L10, 2026-08-21: chain 3/4/5/none = 37.3 / 39.5
        / 38.2 / 48.5 ms, so 3 is the default)."""
        if nl >= level:
            return False                  # the final sort handles order
        if level_offsets is None:
            out = True
        else:
            out = (int(level_offsets[nl + 1]) - int(level_offsets[nl])
                   > 2 * W_BLK)
        if (not out and max_sortfree_chain is not None
                and nl - last_sorted[0] >= max_sortfree_chain):
            out = True
        if out:
            last_sorted[0] = nl
        return out

    def dense_rows_for(l):
        if schedule is None:
            return None
        c = int(schedule[l]) if l < len(schedule) else 0
        return max(rstep,
                   -(-int(-(-c // LANES) * margin_dense) // rstep) * rstep)

    def ray_planes(ridx):
        rid = ridx.reshape(-1)
        if ray_fn is not None:
            o_rows, d_rows = ray_fn(rid)
        else:
            ci = jnp.clip(rid, 0, origin.shape[0] - 1)
            o_rows, d_rows = origin[ci], direction[ci]
        iv_rows = 1.0 / d_rows
        shape = ridx.shape
        return tuple(a[:, c].reshape(shape)
                     for a in (o_rows, d_rows, iv_rows) for c in range(3))

    r0 = -(-num_rays // LANES)
    r0 = -(-r0 // rstep) * rstep
    lane_iota = jnp.arange(r0 * LANES, dtype=jnp.int32).reshape(r0, LANES)
    in_range = lane_iota < num_rays
    pidx = jnp.where(in_range, 0, -1)
    ridx = jnp.where(in_range, lane_iota, 0)
    khi = jnp.zeros((r0, LANES), jnp.int32)
    klo = jnp.zeros((r0, LANES), jnp.int32)

    rays_c = None
    if carry:
        # level-0 plane init is a contiguous reshape (ridx is the
        # identity here) — no gather, ever again: the planes ride the
        # in-kernel compaction from here on. Dead-lane d pads to 1.0 so
        # the per-level XLA reciprocal stays finite.
        if origin is not None:
            o_rows = origin.astype(jnp.float32)
            d_rows = direction.astype(jnp.float32)
        else:
            o_rows, d_rows = ray_fn(jnp.arange(num_rays, dtype=jnp.int32))
            o_rows = o_rows.astype(jnp.float32)
            d_rows = d_rows.astype(jnp.float32)
        padn = r0 * LANES - num_rays

        def plane(col, fill):
            if padn:
                col = jnp.concatenate(
                    [col, jnp.full((padn,), fill, jnp.float32)])
            return col.reshape(r0, LANES)

        rays_c = ([plane(o_rows[:, a], 0.) for a in range(3)]
                  + [plane(d_rows[:, a], 1.) for a in range(3)])

    overflow = jnp.int32(0)
    row_totals = []
    for l in range(level):
        last = l == level - 1
        rows_in = pidx.shape[0]
        steps = rows_in // rstep
        wblk, cbase, cnum, oflow, active = _prepass(pidx, nblk, rstep)
        overflow += oflow
        lvl_oflow = [oflow]
        dense_l = dense_rows_for(l)
        if raw_rows is not None:
            # probe-measured per-level kernel-output rows (x margin):
            # tight capacities shrink the sort inputs, the masking
            # passes, and the ray-plane materialization ~raw_factor-x
            cap_rows = int(raw_rows[l])
        elif dense_l is not None:
            cap_rows = dense_l * raw_factor
        else:
            cap_rows = rows_in * 8
        cap_rows = max(rstep, min(-(-cap_rows // rstep) * rstep,
                                  rows_in * 8))
        call = _cc_level_call(l, steps, last, with_exit, ray_fn_cols,
                              npad, cap_rows, interpret, rstep,
                              emit_rays=carry, merge_rots=merge_rots,
                              merge_lo=merge_lo)
        if carry:
            iv = [1.0 / rays_c[3 + a] for a in range(3)]
            outs = call(active, wblk, cbase, cnum, pidx, ridx, khi, klo,
                        *rays_c, *iv, tbl_t, tbl_t, tbl_t)
        elif ray_fn_cols is None:
            outs = call(active, wblk, cbase, cnum, pidx, ridx, khi, klo,
                        *ray_planes(ridx), tbl_t, tbl_t, tbl_t)
        else:
            outs = call(active, wblk, cbase, cnum, pidx, ridx, khi, klo,
                        tbl_t, tbl_t, tbl_t)
        o_pidx, o_ridx, o_khi, o_klo = outs[0], outs[1], outs[2], outs[3]
        k = 4
        o_rays = None
        if carry and not last:
            o_rays = outs[4:10]
            k = 10
        if last:
            o_ent = outs[k]
            o_ext = outs[k + 1] if with_exit else None
            meta = outs[k + 1 + int(with_exit)]
        else:
            meta = outs[k]
        total = meta[0, 0]
        cap_excess = jnp.maximum(total - cap_rows, 0)
        overflow += cap_excess
        lvl_oflow.append(cap_excess)
        row_totals.append(jnp.stack([total, lvl_oflow[0], cap_excess]))
        # stale rows past the cursor (jit buffer reuse): mask dead
        keep_rows = cap_rows
        rmask = (jnp.arange(keep_rows, dtype=jnp.int32)[:, None]
                 < total)
        pidx = jnp.where(rmask, o_pidx[:keep_rows], -1)
        ridx = jnp.where(rmask, o_ridx[:keep_rows], 0)
        khi = jnp.where(rmask, o_khi[:keep_rows], 0)
        klo = jnp.where(rmask, o_klo[:keep_rows], 0)
        if carry and not last:
            rays_c = [jnp.where(rmask, o_rays[a][:keep_rows],
                                0. if a < 3 else 1.) for a in range(6)]
        if last:
            ent = jnp.where(rmask, o_ent[:keep_rows], 0.)
            if with_exit:
                ext = jnp.where(rmask, o_ext[:keep_rows], 0.)
        if (not last) and needs_sort(l + 1):
            # re-densify + restore node-id locality before a deep
            # level: ray-major frontiers scatter across wide id ranges
            # (window overflow would silently drop subtrees)
            skey = jnp.where(pidx < 0, _INT_MAX, pidx).reshape(-1)
            kpack = (khi << 15) | klo           # both < 2^15: one operand
            ops = (skey, pidx.reshape(-1), ridx.reshape(-1),
                   kpack.reshape(-1))
            if carry:
                # sort cost is operand-count independent (BASELINE.md):
                # the 6 carried planes ride the same sort for free
                ops += tuple(p.reshape(-1) for p in rays_c)
            so = jax.lax.sort(ops, num_keys=1, is_stable=False)
            dn = dense_rows_for(l) if schedule is not None else keep_rows
            kept = jnp.sum((so[0] != _INT_MAX).astype(jnp.int32))
            sort_excess = jnp.maximum(kept - dn * LANES, 0)
            overflow += sort_excess
            lvl_oflow.append(sort_excess)
            n_el = dn * LANES
            pidx = so[1][:n_el].reshape(dn, LANES)
            ridx = so[2][:n_el].reshape(dn, LANES)
            kp = so[3][:n_el].reshape(dn, LANES)
            khi = kp >> 15
            klo = kp & 0x7FFF
            if carry:
                rays_c = [so[4 + a][:n_el].reshape(dn, LANES)
                          for a in range(6)]
                # dead tail entries carry arbitrary sorted-off values;
                # keep d finite for the next level's reciprocal
                dead = pidx < 0
                rays_c[3:] = [jnp.where(dead, 1., p) for p in rays_c[3:]]

    # ---- final: restore the reference's exact output order -------------
    valid = pidx >= 0
    count = jnp.sum(valid.astype(jnp.int32))
    key = khi * jnp.int32(8 ** max(level - _KEY_SPLIT, 0)) + klo
    frid = jnp.where(valid, ridx, _INT_MAX).reshape(-1)
    fkey = jnp.where(valid, key, _INT_MAX).reshape(-1)
    ops = [frid, fkey, pidx.reshape(-1), ridx.reshape(-1), ent.reshape(-1)]
    if with_exit:
        ops.append(ext.reshape(-1))
    so = jax.lax.sort(tuple(ops), num_keys=2, is_stable=False)
    fin_valid = so[0] != _INT_MAX
    out_ridx = jnp.where(fin_valid, so[3], -1)
    out_pidx = jnp.where(fin_valid, so[2], -1)
    depth_cols = [jnp.where(fin_valid, so[4], 0.)]
    if with_exit:
        depth_cols.append(jnp.where(fin_valid, so[5], 0.))
    depth = jnp.stack(depth_cols, axis=-1)
    ret = (out_ridx, out_pidx, depth, count, overflow)
    if return_rows:
        ret += (jnp.stack(row_totals),)
    return ret
