"""SPC ray tracing + pack ops: brute-force cross-check, ordering
invariants, analytic sphere depths, segmented scan semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.spc import (quantize_points, unbatched_points_to_octree,
                                scan_octrees, generate_points,
                                unbatched_get_level_points)
from kaolin_tpu.render.spc import (unbatched_raytrace, mark_pack_boundaries,
                                   diff, sum_reduce, cumsum, cumprod,
                                   exponential_integration,
                                   generate_primary_rays)


def brute_force_ray_voxels(voxels, level, o, d):
    """All (voxel, entry_t) hit by ray o+t*d, via dense slab tests."""
    r = 1.0 / (2 ** level)
    hits = []
    for i, p in enumerate(voxels):
        lo = np.asarray(p) * 2. * r - 1.
        hi = lo + 2. * r
        tmin, tmax = -np.inf, np.inf
        ok = True
        for a in range(3):
            if abs(d[a]) < 1e-12:
                if o[a] < lo[a] or o[a] > hi[a]:
                    ok = False
                    break
            else:
                t0 = (lo[a] - o[a]) / d[a]
                t1 = (hi[a] - o[a]) / d[a]
                t0, t1 = min(t0, t1), max(t0, t1)
                tmin, tmax = max(tmin, t0), min(tmax, t1)
        if ok and tmax >= tmin and tmax > 0 and tmin > 0:
            hits.append((i, tmin))
    hits.sort(key=lambda x: x[1])
    return hits


@pytest.fixture(scope='module')
def sphere_spc():
    level = 5
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(3000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    surf = dirs * 0.7
    qpts = quantize_points(jnp.asarray(surf), level)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(np.asarray(octree))])
    max_level, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    return octree, ph, pyramids[0], exsum, level


def test_raytrace_vs_bruteforce(sphere_spc):
    octree, ph, pyramid, exsum, level = sphere_spc
    voxels = np.asarray(unbatched_get_level_points(ph, pyramid, level))
    lvl_off = int(pyramid[1, level])
    rng = np.random.default_rng(1)
    origins = np.tile([[0., 0., -2.5]], (20, 1))
    targets = rng.uniform(-0.5, 0.5, (20, 3))
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ridx, pidx, depth = unbatched_raytrace(
        octree, ph, pyramid, exsum, jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32), level)
    ridx, pidx, depth = (np.asarray(ridx), np.asarray(pidx),
                         np.asarray(depth)[:, 0])
    for rid in range(20):
        mine = pidx[ridx == rid] - lvl_off
        mine_d = depth[ridx == rid]
        gt = brute_force_ray_voxels(voxels, level, origins[rid], dirs[rid])
        gt_ids = [g[0] for g in gt]
        assert mine.tolist() == gt_ids, f"ray {rid}"
        np.testing.assert_allclose(mine_d, [g[1] for g in gt], rtol=1e-4,
                                   atol=1e-5)
        # near-to-far within the ray
        assert (np.diff(mine_d) >= -1e-6).all()


def test_raytrace_ray_ordering(sphere_spc):
    octree, ph, pyramid, exsum, level = sphere_spc
    o, d = generate_primary_rays(16, 16, jnp.asarray([0., 0., 2.5]),
                                 jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                 jnp.pi / 3)
    ridx, pidx, depth = unbatched_raytrace(octree, ph, pyramid, exsum, o, d,
                                           level)
    r = np.asarray(ridx)
    assert (np.diff(r) >= 0).all()          # sorted by ray
    assert (np.asarray(depth) > 0).all()


def test_raytrace_with_exit(sphere_spc):
    octree, ph, pyramid, exsum, level = sphere_spc
    o = jnp.asarray([[0., 0., -2.]], jnp.float32)
    d = jnp.asarray([[0., 0., 1.]], jnp.float32)
    ridx, pidx, depth = unbatched_raytrace(octree, ph, pyramid, exsum, o, d,
                                           level, with_exit=True)
    dep = np.asarray(depth)
    assert dep.shape[1] == 2
    assert (dep[:, 1] > dep[:, 0]).all()
    # voxel thickness = 2/2^level along an axis-aligned ray
    np.testing.assert_allclose(dep[:, 1] - dep[:, 0], 2. / 2 ** level,
                               rtol=1e-4)


def test_raytrace_sphere_depth(sphere_spc):
    """First hit depth approximates analytic sphere intersection."""
    octree, ph, pyramid, exsum, level = sphere_spc
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(50, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = -2.0 * dirs                    # aim at center from radius 2
    ridx, pidx, depth = unbatched_raytrace(
        octree, ph, pyramid, exsum, jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32), level)
    ridx = np.asarray(ridx)
    first = mark_pack_boundaries(jnp.asarray(ridx))
    first_d = np.asarray(depth)[np.asarray(first), 0]
    expected = 2.0 - 0.7                     # distance to sphere surface
    assert abs(np.median(first_d) - expected) < 0.1


def test_mark_pack_boundaries():
    ids = jnp.asarray([1, 1, 1, 1, 2, 2, 2])
    out = np.asarray(mark_pack_boundaries(ids))
    assert out.tolist() == [True, False, False, False, True, False, False]


def test_pack_ops_against_numpy():
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, 5, 40))
    boundaries = jnp.asarray(np.concatenate([[True], ids[1:] != ids[:-1]]))
    feats = jnp.asarray(rng.normal(size=(40, 3)))
    segs = np.cumsum(np.asarray(boundaries)) - 1

    # diff
    d = np.asarray(diff(feats, boundaries))
    f = np.asarray(feats)
    for i in range(40):
        if i == 39 or segs[i + 1] != segs[i]:
            np.testing.assert_allclose(d[i], 0.)
        else:
            np.testing.assert_allclose(d[i], f[i + 1] - f[i], rtol=1e-6)

    # sum_reduce
    sr = np.asarray(sum_reduce(feats, boundaries))
    for s in range(segs.max() + 1):
        np.testing.assert_allclose(sr[s], f[segs == s].sum(0), rtol=1e-6)

    # cumsum / cumprod all variants
    for exclusive in [False, True]:
        for reverse in [False, True]:
            cs = np.asarray(cumsum(feats, boundaries, exclusive, reverse))
            cp = np.asarray(cumprod(jnp.abs(feats) + 0.1, boundaries,
                                    exclusive, reverse))
            fa = np.abs(f) + 0.1
            for s in range(segs.max() + 1):
                x = f[segs == s]
                xa = fa[segs == s]
                if reverse:
                    ref_s = np.cumsum(x[::-1], 0)[::-1]
                    ref_p = np.cumprod(xa[::-1], 0)[::-1]
                    if exclusive:
                        ref_s = np.concatenate([ref_s[1:], np.zeros((1, 3))])
                        ref_p = np.concatenate([ref_p[1:], np.ones((1, 3))])
                else:
                    ref_s = np.cumsum(x, 0)
                    ref_p = np.cumprod(xa, 0)
                    if exclusive:
                        ref_s = np.concatenate([np.zeros((1, 3)), ref_s[:-1]])
                        ref_p = np.concatenate([np.ones((1, 3)), ref_p[:-1]])
                np.testing.assert_allclose(cs[segs == s], ref_s, rtol=1e-6,
                                           atol=1e-12)
                np.testing.assert_allclose(cp[segs == s], ref_p, rtol=1e-6)


def test_exponential_integration():
    boundaries = jnp.asarray([True, False, False, True, False])
    tau = jnp.asarray([[0.5], [1.0], [0.2], [0.3], [0.4]])
    feats = jnp.asarray(np.random.default_rng(0).random((5, 2)))
    out, transmittance = exponential_integration(feats, tau, boundaries)
    # manual Beer-Lambert for pack 0
    t = np.asarray(tau)[:, 0]
    alpha = 1 - np.exp(-t)
    T = np.exp(-np.concatenate([[0.], np.cumsum(t[:2])]))  # exclusive
    w = T[:3] * alpha[:3]
    expected0 = (w[:, None] * np.asarray(feats)[:3]).sum(0)
    np.testing.assert_allclose(np.asarray(out)[0], expected0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(transmittance)[:3, 0], w,
                               rtol=1e-5)


def test_raytrace_ray_fn_parity(sphere_spc):
    """The operand-reduced ray_fn path returns the identical intersection
    stream (set, order, indices) as the carried-operand path; depths
    agree to ~2 ulp (FMA clustering differs between the graphs)."""
    from kaolin_tpu.render.spc import primary_rays_fn
    from kaolin_tpu.render.spc.raytrace import unbatched_raytrace_fixed
    octree, ph, pyramid, exsum, level = sphere_spc
    fn = primary_rays_fn(32, 32, jnp.asarray([0.4, 0.3, 2.5]),
                         jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                         jnp.pi / 3)
    o, d = fn(jnp.arange(32 * 32, dtype=jnp.int32))
    o2, d2 = generate_primary_rays(32, 32, jnp.asarray([0.4, 0.3, 2.5]),
                                   jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                   jnp.pi / 3)
    assert np.array_equal(np.asarray(o), np.asarray(o2))
    assert np.array_equal(np.asarray(d), np.asarray(d2))
    cap = 32 * 32 * 32
    a = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 with_exit=True)
    b = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 with_exit=True, ray_fn=fn)
    assert int(a[3]) == int(b[3]) and int(a[3]) > 0
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                               atol=2e-6, rtol=0)


def test_raytrace_level_offsets_parity(sphere_spc):
    """The per-level subtable gather path (static ``level_offsets``) is
    bit-identical to the whole-table gather: same counts, indices, and
    depths (the gather reads the same values, only through level-sliced
    subtables that stay in the backend's fast-gather size regime)."""
    from kaolin_tpu.render.spc.raytrace import (unbatched_raytrace_fixed,
                                                level_offsets_from_octree)
    octree, ph, pyramid, exsum, level = sphere_spc
    offs = level_offsets_from_octree(octree)
    assert offs[0] == 0 and offs[-1] == int(np.asarray(octree).shape[0])
    assert len(offs) >= level + 1
    o, d = generate_primary_rays(32, 32, jnp.asarray([0.4, 0.3, 2.5]),
                                 jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                 jnp.pi / 3)
    cap = 32 * 32 * 32
    a = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 with_exit=True)
    b = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 with_exit=True, level_offsets=offs)
    assert int(a[3]) == int(b[3]) and int(a[3]) > 0
    for i in range(3):
        assert np.array_equal(np.asarray(a[i]), np.asarray(b[i]))


def test_traverse_banded_exact():
    """The Pallas banded-frontier traversal (interpret mode on CPU)
    reproduces the XLA path bit-exactly: same count, same ray/point
    index streams in the same (ray-major, near-to-far DFS) order; the
    octant-order emission + final (ray, path_key) sort restores
    VOXEL_ORDER tie order exactly. Depths agree to a few ulp (the
    kernel recomputes rays and the slab test with its own op
    clustering)."""
    from kaolin_tpu.render.spc.raytrace import (unbatched_raytrace_fixed,
                                                primary_rays_fn,
                                                primary_rays_fn_cols)
    from kaolin_tpu.kernels.spc_traverse import (build_node_table_t,
                                                 traverse_banded)
    # a small level-3 SPC keeps interpret-mode runtime sane; TPU-side
    # parity at level 8/10 is covered by the bench harness comparisons
    # (bit-exact at both scales, BASELINE.md 2026-08-21)
    level = 3
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(700, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    qpts = quantize_points(jnp.asarray(dirs * 0.7, jnp.float32), level)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    H = W = 8
    cam = (jnp.asarray([0.3, 0.2, 2.5]), jnp.zeros(3),
           jnp.asarray([0., 1., 0.]), jnp.pi / 3)
    ray_fn = primary_rays_fn(H, W, *cam)
    ray_cols = primary_rays_fn_cols(H, W, *cam)
    num_rays = H * W
    o, d = ray_fn(jnp.arange(num_rays, dtype=jnp.int32))
    # the componentwise closure is bit-identical to the row closure
    cols = ray_cols(jnp.arange(num_rays, dtype=jnp.int32))
    assert np.array_equal(np.stack(cols[3:], -1), np.asarray(d))
    assert np.array_equal(np.stack(cols[:3], -1), np.asarray(o))

    tbl = build_node_table_t(octree, exsum)
    # full-depth exactness with the in-kernel ray recompute; the other
    # two ray sources (per-level XLA recompute, carried arrays) cover
    # their plumbing at a shallow level to keep interpret time sane
    for with_exit in (False, True):
        ref = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level,
                                       num_rays * 64, with_exit=with_exit)
        rn = int(ref[3])
        out = traverse_banded(tbl, num_rays, level, None,
                              ray_fn_cols=ray_cols, with_exit=with_exit,
                              interpret=True)
        n, ov = int(out[3]), int(out[4])
        assert ov == 0
        assert n == rn and n > 0
        assert np.array_equal(np.asarray(out[0][:n]),
                              np.asarray(ref[0][:n]))
        assert np.array_equal(np.asarray(out[1][:n]),
                              np.asarray(ref[1][:n]))
        np.testing.assert_allclose(np.asarray(out[2][:n]),
                                   np.asarray(ref[2][:n]),
                                   atol=2e-6, rtol=0)
    ref3 = unbatched_raytrace_fixed(octree, ph, exsum, o, d, 2,
                                    num_rays * 32)
    rn3 = int(ref3[3])
    for kw in (dict(ray_fn=ray_fn), dict(origin=o, direction=d)):
        out = traverse_banded(tbl, num_rays, 2, None, interpret=True, **kw)
        n, ov = int(out[3]), int(out[4])
        assert ov == 0 and n == rn3 and n > 0
        assert np.array_equal(np.asarray(out[0][:n]), np.asarray(ref3[0][:n]))
        assert np.array_equal(np.asarray(out[1][:n]), np.asarray(ref3[1][:n]))


def test_voxel_order_matches_cuda_table():
    """The generated near-to-far octant order table equals the CUDA
    constant VOXEL_ORDER (raytrace_cuda.cu:48-57) literally. The rule is
    ascending (popcount(o ^ code), o) — tie-break by ascending octant
    id, NOT by o ^ code (the xor shortcut matches only codes 0-1)."""
    from kaolin_tpu.render.spc.raytrace import VOXEL_ORDER, _VOXEL_RANK
    cuda_table = (
        (0, 1, 2, 4, 3, 5, 6, 7),
        (1, 0, 3, 5, 2, 4, 7, 6),
        (2, 0, 3, 6, 1, 4, 7, 5),
        (3, 1, 2, 7, 0, 5, 6, 4),
        (4, 0, 5, 6, 1, 2, 7, 3),
        (5, 1, 4, 7, 0, 3, 6, 2),
        (6, 2, 4, 7, 0, 3, 5, 1),
        (7, 3, 5, 6, 1, 2, 4, 0),
    )
    assert VOXEL_ORDER == cuda_table
    for c in range(8):
        for o in range(8):
            assert VOXEL_ORDER[c][_VOXEL_RANK[c][o]] == o
    # the kernel's rank table is generated by the same rule
    from kaolin_tpu.kernels.spc_traverse import _VOXEL_RANK as k_rank
    assert k_rank == _VOXEL_RANK


def _dfs_reference_order(octree_np, exsum_np, level, o, d, order_table,
                         with_exit=False):
    """Per-ray reference traversal in the CUDA's exact emission order:
    depth-first, children visited in ``order_table[code]`` order (the
    level-synchronous BFS emits the same final sequence). Float64 slab
    math — generic scenes keep decisions far from the ulp edge."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    with np.errstate(divide='ignore'):
        inv = 1.0 / d
    sgn = np.where(np.signbit(d), 1.0, -1.0)
    sgn_exit = np.where(np.signbit(-d), 1.0, -1.0)

    def ray_aabb(vc, r, s):
        oc = o - vc
        if np.max(np.abs(oc)) < r:
            return -r
        with np.errstate(invalid='ignore'):
            dd = (r * s - oc) * inv
        with np.errstate(invalid='ignore'):
            for a, (b1, b2) in ((0, (1, 2)), (1, (0, 2)), (2, (0, 1))):
                if dd[a] >= 0 and abs(d[b1] * dd[a] + oc[b1]) <= r \
                        and abs(d[b2] * dd[a] + oc[b2]) <= r:
                    return dd[a]
        return 0.0

    out = []

    def rec(idx, lvl, p):
        r = 1.0 / (1 << lvl)
        rc = r * 0.5
        vc = r * (2. * p + 1.) - 1.
        byte = int(octree_np[idx])
        frac = (0.5 * o + 0.5) - r * (p + 0.5)
        code = (frac[0] > 0) * 4 + (frac[1] > 0) * 2 + (frac[2] > 0)
        last = lvl + 1 == level
        for oct_ in order_table[code]:
            if not (byte >> oct_) & 1:
                continue
            off = np.array([(oct_ >> 2) & 1, (oct_ >> 1) & 1, oct_ & 1],
                           np.float64)
            vcc = vc - rc + r * off
            entry = ray_aabb(vcc, rc, sgn)
            child = int(exsum_np[idx]) + bin(byte & ((2 << oct_) - 1)
                                            ).count('1')
            if last:
                if entry <= 0:
                    continue
                if with_exit:
                    exit_ = ray_aabb(vcc, rc, sgn_exit)
                    if exit_ <= 0:
                        continue
                    out.append((child, entry, exit_))
                else:
                    out.append((child, entry))
            elif entry != 0.0:
                rec(child, lvl + 1, p * 2. + off)

    rec(0, 0, np.zeros(3))
    return out


def test_raytrace_emission_order_vs_dfs_oracle(sphere_spc):
    """Full nugget STREAM (not depth-sorted) equality against a numpy
    DFS oracle implementing the reference's VOXEL_ORDER emission, from
    camera positions whose per-parent origin-octant codes span 2-7."""
    from kaolin_tpu.render.spc.raytrace import (VOXEL_ORDER,
                                                unbatched_raytrace_fixed)
    octree, ph, pyramid, exsum, level = sphere_spc
    octree_np = np.asarray(octree)
    exsum_np = np.asarray(exsum)
    rng = np.random.default_rng(7)
    eyes = np.array([[1.9, 1.3, -1.7], [-2.1, 0.8, 1.2],
                     [0.9, -2.2, 0.7], [-1.3, -1.1, -1.6]])
    for eye in eyes:
        targets = rng.uniform(-0.6, 0.6, (25, 3))
        dirs = targets - eye
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = np.tile(eye, (25, 1)).astype(np.float32)
        dirs = dirs.astype(np.float32)
        ridx, pidx, depth, count = unbatched_raytrace_fixed(
            octree, ph, exsum, jnp.asarray(origins), jnp.asarray(dirs),
            level, 25 * 128)
        n = int(count)
        ridx = np.asarray(ridx)[:n]
        pidx = np.asarray(pidx)[:n]
        depth = np.asarray(depth)[:n, 0]
        for rid in range(25):
            gt = _dfs_reference_order(octree_np, exsum_np, level,
                                      origins[rid], dirs[rid], VOXEL_ORDER)
            mine = pidx[ridx == rid].tolist()
            assert mine == [g[0] for g in gt], f"eye {eye} ray {rid}"
            np.testing.assert_allclose(
                depth[ridx == rid], [g[1] for g in gt], rtol=1e-5,
                atol=1e-6)


def test_raytrace_voxel_order_tie_break(sphere_spc):
    """Boundary-degenerate rays are where the VOXEL_ORDER tie-break is
    observable: along a straight ray each axis crosses a cell mid-plane
    at most once, always moving AWAY from the ray origin's side, so the
    popcount class of visited children strictly increases — generic rays
    can never hit two same-class children of one parent. Axis-aligned
    rays on exact lattice planes hit cells on BOTH sides via the
    boundary-inclusive slab test (|lt| <= r), producing same-class
    multi-hits whose order the table dictates. This test (a) asserts the
    implementation matches the true-table DFS oracle on a lattice-ray
    family, and (b) asserts that family discriminates the true table
    from the old xor-rank rule (so a regression cannot pass silently)."""
    from kaolin_tpu.render.spc.raytrace import (VOXEL_ORDER,
                                                unbatched_raytrace_fixed)
    octree, ph, pyramid, exsum, level = sphere_spc
    octree_np = np.asarray(octree)
    exsum_np = np.asarray(exsum)
    xor_table = tuple(
        tuple(sorted(range(8), key=lambda o, c=c: (bin(o ^ c).count('1'),
                                                   o ^ c)))
        for c in range(8))
    # axis-aligned rays on exact level-3 lattice planes, all 3 axes
    lat = [k / 8. * 2. - 1. for k in range(9)]
    origins, dirs = [], []
    for axis in range(3):
        oa = [a for a in range(3) if a != axis]
        for u in lat:
            for v in lat:
                e = [0., 0., 0.]
                d = [0., 0., 0.]
                e[axis], d[axis] = 2.5, -1.0
                e[oa[0]], e[oa[1]] = u, v
                origins.append(e)
                dirs.append(d)
    origins = np.asarray(origins, np.float32)
    dirs = np.asarray(dirs, np.float32)
    ridx, pidx, depth, count = unbatched_raytrace_fixed(
        octree, ph, exsum, jnp.asarray(origins), jnp.asarray(dirs), level,
        len(origins) * 256)
    n = int(count)
    ridx = np.asarray(ridx)[:n]
    pidx = np.asarray(pidx)[:n]
    discriminated = 0
    for rid in range(len(origins)):
        gt = _dfs_reference_order(octree_np, exsum_np, level,
                                  origins[rid], dirs[rid], VOXEL_ORDER)
        mine = pidx[ridx == rid].tolist()
        assert mine == [g[0] for g in gt], f"lattice ray {rid}"
        gx = _dfs_reference_order(octree_np, exsum_np, level,
                                  origins[rid], dirs[rid], xor_table)
        if [g[0] for g in gx] != [g[0] for g in gt]:
            discriminated += 1
    assert discriminated >= 10, (
        f"only {discriminated} rays exercised the tie-break difference")


def test_traverse_banded_cc_exact():
    """The cursor-compaction traversal (interpret mode on CPU) matches
    the XLA path bit-exactly: same count, same ray/point index streams
    in the reference order. In-kernel row compaction + lane-rotation
    merges + the hybrid sort policy replace the per-level re-densify
    sorts; parity on real TPU at 256^2/L8 (bit-exact incl. depths) and
    512^2/L10 is recorded in BASELINE.md."""
    from kaolin_tpu.render.spc.raytrace import (unbatched_raytrace_fixed,
                                                primary_rays_fn,
                                                primary_rays_fn_cols)
    from kaolin_tpu.kernels.spc_traverse import (build_node_table_t,
                                                 traverse_banded_cc)
    level = 3
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(700, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    qpts = quantize_points(jnp.asarray(dirs * 0.7, jnp.float32), level)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    H = W = 8
    cam = (jnp.asarray([0.3, 0.2, 2.5]), jnp.zeros(3),
           jnp.asarray([0., 1., 0.]), jnp.pi / 3)
    ray_fn = primary_rays_fn(H, W, *cam)
    ray_cols = primary_rays_fn_cols(H, W, *cam)
    num_rays = H * W
    o, d = ray_fn(jnp.arange(num_rays, dtype=jnp.int32))
    tbl = build_node_table_t(octree, exsum, ph)

    for with_exit in (False, True):
        ref = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level,
                                       num_rays * 64, with_exit=with_exit,
                                       backend='xla')
        rn = int(ref[3])
        out = traverse_banded_cc(tbl, num_rays, level, None,
                                 ray_fn_cols=ray_cols, rstep=8,
                                 with_exit=with_exit, interpret=True)
        n, ov = int(out[3]), int(out[4])
        assert ov == 0 and n == rn and n > 0
        assert np.array_equal(np.asarray(out[0][:n]), np.asarray(ref[0][:n]))
        assert np.array_equal(np.asarray(out[1][:n]), np.asarray(ref[1][:n]))
        np.testing.assert_allclose(np.asarray(out[2][:n]),
                                   np.asarray(ref[2][:n]), atol=2e-6,
                                   rtol=0)
    # counts-scheduled run + forced per-level re-densify sorts
    counts = unbatched_raytrace_fixed(
        octree, ph, exsum, o, d, level, num_rays * 64,
        return_level_counts=True, backend='xla')[4]
    sched = tuple(int(c) for c in np.asarray(counts))
    ref = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level,
                                   num_rays * 64, backend='xla')
    for kw in (dict(ray_fn=ray_fn),
               dict(ray_fn=ray_fn, level_offsets=None),
               dict(origin=o, direction=d),                 # carried planes
               dict(origin=o, direction=d, carry_rays=False),  # gathers
               dict(ray_fn=ray_fn, carry_rays=True)):
        out = traverse_banded_cc(tbl, num_rays, level, sched, rstep=8,
                                 interpret=True, raw_factor=6, **kw)
        n, ov = int(out[3]), int(out[4])
        assert ov == 0 and n == int(ref[3])
        assert np.array_equal(np.asarray(out[0][:n]), np.asarray(ref[0][:n]))
        assert np.array_equal(np.asarray(out[1][:n]), np.asarray(ref[1][:n]))


def test_raytrace_banded_public_api(sphere_spc):
    """verdict r3 #2: the same scene traced through BOTH backends of the
    PUBLIC API returns identical nuggets; the eager wrapper's banded
    backend (with its XLA probe + overflow fallback) matches too."""
    from kaolin_tpu.render.spc.raytrace import (unbatched_raytrace_fixed,
                                                plan_raytrace,
                                                level_offsets_from_octree,
                                                primary_rays_fn)
    octree, ph, pyramid, exsum, level = sphere_spc
    level = 3                      # keep interpret-mode runtime sane
    H = W = 8
    ray_fn = primary_rays_fn(H, W, jnp.asarray([0., 0., 2.5]),
                             jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                             jnp.pi / 3)
    o, d = ray_fn(jnp.arange(H * W, dtype=jnp.int32))
    offs = level_offsets_from_octree(octree)
    cap = H * W * 64
    _, counts = plan_raytrace(octree, ph, exsum, o, d, level, cap=cap,
                              level_offsets=offs, return_counts=True)
    a = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 cap_schedule=counts, level_offsets=offs,
                                 backend='xla')
    b = unbatched_raytrace_fixed(octree, ph, exsum, o, d, level, cap,
                                 cap_schedule=counts, level_offsets=offs,
                                 backend='banded')
    n = int(a[3])
    assert int(b[3]) == n and n > 0
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                               atol=2e-6, rtol=0)
    # eager wrapper, banded backend
    ridx, pidx, depth = unbatched_raytrace(octree, ph, pyramid, exsum,
                                           o, d, level, backend='banded')
    assert np.array_equal(np.asarray(ridx), np.asarray(a[0][:n]))
    assert np.array_equal(np.asarray(pidx), np.asarray(a[1][:n]))


def test_eager_schedule_cache(monkeypatch, sphere_spc):
    """The eager wrapper's probe-schedule cache (round 5): repeated
    banded calls on the same scene probe once; an overflowing schedule
    falls back to XLA and evicts the entry."""
    import kaolin_tpu.render.spc.raytrace as rt
    octree, ph, pyramid, exsum, _ = sphere_spc
    level = 3
    o, d = rt.generate_primary_rays(8, 8, jnp.asarray([0., 0., 2.5]),
                                    jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                    jnp.pi / 3)
    calls = {'n': 0}
    real_plan = rt.plan_raytrace

    def counting_plan(*a, **kw):
        calls['n'] += 1
        return real_plan(*a, **kw)

    monkeypatch.setattr(rt, 'plan_raytrace', counting_plan)
    rt._EAGER_SCHED_CACHE.clear()
    ref = rt.unbatched_raytrace(octree, ph, pyramid, exsum, o, d, level,
                                backend='xla')
    out1 = rt.unbatched_raytrace(octree, ph, pyramid, exsum, o, d, level,
                                 backend='banded')
    assert calls['n'] == 1 and len(rt._EAGER_SCHED_CACHE) == 1
    out2 = rt.unbatched_raytrace(octree, ph, pyramid, exsum, o, d, level,
                                 backend='banded')
    assert calls['n'] == 1, 'second call must hit the schedule cache'
    for a, b in zip(ref, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=0)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))

    # simulated banded overflow -> XLA fallback + cache eviction (tiny
    # scenes cannot overflow for real: per-level caps floor at rstep
    # rows, which already covers this scene)
    key = next(iter(rt._EAGER_SCHED_CACHE))
    real_fixed = rt.unbatched_raytrace_fixed

    def overflowing_fixed(*a, backend='auto', **kw):
        out = real_fixed(*a, backend=backend, **kw)
        if backend == 'banded':
            cap = a[6] if len(a) > 6 else kw['cap']
            return out[:3] + (jnp.asarray(cap + 1, jnp.int32),)
        return out

    monkeypatch.setattr(rt, 'unbatched_raytrace_fixed', overflowing_fixed)
    out3 = rt.unbatched_raytrace(octree, ph, pyramid, exsum, o, d, level,
                                 backend='banded')
    assert key not in rt._EAGER_SCHED_CACHE, 'overflow must evict'
    for a, b in zip(ref, out3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=0)
