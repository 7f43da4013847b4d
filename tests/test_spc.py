"""SPC octree core: morton codes, octree build/scan/points roundtrip,
query, dual/trinkets, trilinear interpolation, dense conversions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import spc as spc_ops
from kaolin_tpu.ops.spc import (points_to_morton, morton_to_points,
                                points_to_corners, quantize_points,
                                unbatched_points_to_octree, scan_octrees,
                                generate_points, unbatched_query,
                                unbatched_get_level_points,
                                unbatched_make_dual, unbatched_make_trinkets,
                                unbatched_interpolate_trilinear,
                                coords_to_trilinear_coeffs, to_dense,
                                feature_grids_to_spc, uint8_to_bits,
                                bits_to_uint8, uint8_bits_sum)
from kaolin_tpu.rep import Spc


def test_points_to_morton_reference_example():
    # kaolin/ops/spc/points.py:76-85 doctest
    pts = jnp.asarray([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3],
                       [0, 1, 0]], dtype=jnp.int16)
    np.testing.assert_array_equal(np.asarray(points_to_morton(pts)),
                                  [0, 1, 8, 9, 2])
    back = morton_to_points(points_to_morton(pts))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pts))


def test_morton_roundtrip_random():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.integers(0, 1024, (1000, 3)), dtype=jnp.int16)
    back = morton_to_points(points_to_morton(pts))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pts))


def test_points_to_corners_example():
    pts = jnp.asarray([[0, 0, 0], [0, 2, 0]], dtype=jnp.int16)
    out = np.asarray(points_to_corners(pts))
    assert out.shape == (2, 8, 3)
    np.testing.assert_array_equal(
        out[0], [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                 [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]])
    np.testing.assert_array_equal(out[1][:2], [[0, 2, 0], [0, 2, 1]])


def test_uint8_helpers():
    vals = jnp.asarray([0, 1, 255, 170], dtype=jnp.uint8)
    bits = uint8_to_bits(vals)
    assert np.asarray(bits)[1].tolist() == [True] + [False] * 7
    np.testing.assert_array_equal(np.asarray(bits_to_uint8(bits)),
                                  np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(uint8_bits_sum(vals)),
                                  [0, 1, 8, 4])


@pytest.fixture
def simple_octree():
    """Two-level octree containing points (0,0,0) and (3,3,3) at level 2."""
    points = jnp.asarray([[0, 0, 0], [3, 3, 3]], dtype=jnp.int16)
    octree = unbatched_points_to_octree(points, 2)
    return octree, points


def test_points_to_octree_structure(simple_octree):
    octree, _ = simple_octree
    o = np.asarray(octree)
    # root has children 0 (for 0,0,0) and 7 (for 3,3,3): byte 0b10000001
    assert o[0] == 0x81
    # level 1: node (0,0,0) has child 0; node (1,1,1) has child 7
    assert o[1] == 0x01 and o[2] == 0x80
    assert o.shape[0] == 3


def test_scan_and_generate(simple_octree):
    octree, points = simple_octree
    max_level, pyramids, exsum = scan_octrees(octree, np.array([3]))
    assert max_level == 2
    np.testing.assert_array_equal(pyramids[0, 0, :3], [1, 2, 2])
    np.testing.assert_array_equal(pyramids[0, 1, :4], [0, 1, 3, 5])
    np.testing.assert_array_equal(np.asarray(exsum), [0, 2, 3, 4])
    ph = generate_points(octree, pyramids, exsum)
    np.testing.assert_array_equal(
        np.asarray(ph),
        [[0, 0, 0], [0, 0, 0], [1, 1, 1], [0, 0, 0], [3, 3, 3]])
    lvl2 = unbatched_get_level_points(ph, pyramids[0], 2)
    np.testing.assert_array_equal(np.asarray(lvl2), np.asarray(points))


def test_query(simple_octree):
    octree, _ = simple_octree
    max_level, pyramids, exsum = scan_octrees(octree, np.array([3]))
    coords = jnp.asarray([[0, 0, 0], [3, 3, 3], [1, 1, 1], [2, 2, 2]],
                         dtype=jnp.int32)
    pidx = unbatched_query(octree, exsum, coords, 2)
    # level-2 points are hierarchy indices 3 (0,0,0) and 4 (3,3,3);
    # query returns the index within the hierarchy
    ph = np.asarray(generate_points(octree, pyramids, exsum))
    out = np.asarray(pidx)
    assert out[2] == -1 and out[3] == -1
    np.testing.assert_array_equal(ph[out[0]], [0, 0, 0])
    np.testing.assert_array_equal(ph[out[1]], [3, 3, 3])
    multi = unbatched_query(octree, exsum, coords, 2, with_parents=True)
    m = np.asarray(multi)
    assert m.shape == (4, 3)
    assert m[0].tolist() == [0, 1, 3]
    assert m[2].tolist() == [0, 1, -1]  # parent voxel exists, leaf missing


def test_query_float_coords(simple_octree):
    octree, _ = simple_octree
    _, pyramids, exsum = scan_octrees(octree, np.array([3]))
    # voxel (0,0,0) at level 2 covers [-1, -0.5]^3
    coords = jnp.asarray([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9],
                          [0.1, 0.1, 0.1]])
    out = np.asarray(unbatched_query(octree, exsum, coords, 2))
    assert out[0] == 3 and out[1] == 4 and out[2] == -1


def test_random_octree_roundtrip():
    rng = np.random.default_rng(7)
    level = 5
    pts = np.unique(rng.integers(0, 2 ** level, (300, 3)), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(pts, dtype=jnp.int16),
                                        level)
    max_level, pyramids, exsum = scan_octrees(
        octree, np.array([len(np.asarray(octree))]))
    assert max_level == level
    ph = generate_points(octree, pyramids, exsum)
    lvl_pts = np.asarray(unbatched_get_level_points(ph, pyramids[0], level))
    # generated leaf points = input points in morton order
    morton = np.asarray(points_to_morton(jnp.asarray(pts, dtype=jnp.int16)))
    order = np.argsort(morton)
    np.testing.assert_array_equal(lvl_pts, pts[order])
    # every input point queries to a valid index; shifted points mostly miss
    pidx = np.asarray(unbatched_query(
        octree, exsum, jnp.asarray(pts, jnp.int32), level))
    assert (pidx >= 0).all()
    np.testing.assert_array_equal(
        np.asarray(ph)[pidx], pts)


def test_dual_and_trinkets(simple_octree):
    octree, _ = simple_octree
    _, pyramids, exsum = scan_octrees(octree, np.array([3]))
    ph = generate_points(octree, pyramids, exsum)
    phd, pyr_dual = unbatched_make_dual(ph, pyramids[0])
    # level 0 dual = 8 corners of the root voxel
    assert pyr_dual[0, 0] == 8
    trinkets, parents = unbatched_make_trinkets(ph, pyramids[0], phd,
                                                pyr_dual)
    assert trinkets.shape == (np.asarray(ph).shape[0], 8)
    # corners referenced by trinkets must equal points_to_corners
    t0 = np.asarray(trinkets)[0]
    corners = np.asarray(phd)[t0]
    np.testing.assert_array_equal(corners,
                                  np.asarray(points_to_corners(ph[0:1]))[0])
    assert np.asarray(parents)[0] == -1
    assert np.asarray(parents)[3] == 1  # (0,0,0)@2's parent is (0,0,0)@1


def test_trilinear_interpolation_linear_function():
    """Trilinear interp of a linear field reproduces it exactly."""
    rng = np.random.default_rng(3)
    level = 3
    pts = np.unique(rng.integers(0, 2 ** level, (60, 3)), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(pts, jnp.int16), level)
    _, pyramids, exsum = scan_octrees(octree,
                                      np.array([len(np.asarray(octree))]))
    ph = generate_points(octree, pyramids, exsum)
    phd, pyr_dual = unbatched_make_dual(ph, pyramids[0])
    trinkets, _ = unbatched_make_trinkets(ph, pyramids[0], phd, pyr_dual)
    # features on the finest-level dual corners: linear in position
    lvl_off = int(pyr_dual[1, level])
    n_dual = int(pyr_dual[0, level])
    corners = np.asarray(phd)
    w = np.array([0.3, -0.7, 1.9])
    feats_full = jnp.asarray((corners @ w)[:, None].astype(np.float64))
    # query points inside occupied voxels
    centers = (pts + 0.5) / (2 ** (level - 1)) - 1.0
    offs = rng.uniform(-0.4, 0.4, centers.shape) / (2 ** (level - 1))
    coords = jnp.asarray(centers + offs)[:, None, :]
    pidx = unbatched_query(octree, exsum,
                           jnp.asarray(pts, jnp.int32), level)
    out = unbatched_interpolate_trilinear(coords, pidx, ph, trinkets,
                                          feats_full, level)
    # expected: linear field evaluated at the grid-space coords
    grid_coords = (np.asarray(coords)[:, 0, :] * 0.5 + 0.5) * 2 ** level
    expected = grid_coords @ w
    np.testing.assert_allclose(np.asarray(out)[:, 0, 0], expected,
                               rtol=1e-6, atol=1e-6)


def test_to_dense_and_feature_grids_roundtrip():
    rng = np.random.default_rng(1)
    grid = np.zeros((2, 3, 8, 8, 8), dtype=np.float32)
    occ = rng.random((2, 8, 8, 8)) < 0.2
    grid[:, :, occ[0]] = 0.
    for b in range(2):
        vals = rng.normal(size=(occ[b].sum(), 3)).astype(np.float32)
        grid[b].transpose(1, 2, 3, 0)[occ[b]] = vals
    octrees, lengths, feats = feature_grids_to_spc(jnp.asarray(grid))
    spc = Spc(octrees, lengths, features=feats)
    dense = spc.to_dense(spc.features, level=3)
    np.testing.assert_allclose(np.asarray(dense), grid, atol=1e-6)


def test_spc_container_lazy():
    points = jnp.asarray([[0, 0, 0], [3, 3, 3]], dtype=jnp.int16)
    octree = unbatched_points_to_octree(points, 2)
    spc = Spc(octree, np.array([3]))
    assert spc.max_level == 2
    assert spc.batch_size == 1
    assert np.asarray(spc.point_hierarchies).shape == (5, 3)
