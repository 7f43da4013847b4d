"""Extended SPC coverage: multiscale/with_parents queries, conv jump
up/down with bias, Spc container constructors (make_dense,
from_features, from_list), random-octree validity, and query-miss
semantics. Complements tests/test_spc.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.spc import (quantize_points, unbatched_points_to_octree,
                                scan_octrees, generate_points,
                                unbatched_query, unbatched_get_level_points,
                                points_to_morton, morton_to_points)
from kaolin_tpu.rep import Spc


@pytest.fixture(scope='module')
def sphere():
    level = 4
    rng = np.random.default_rng(0)
    d = rng.normal(size=(500, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    qpts = quantize_points(jnp.asarray(d * 0.7, jnp.float32), level)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    return octree, ph, pyramids, exsum, level


def test_query_with_parents_chain(sphere):
    """with_parents returns the full ancestor chain; each level's id
    points at the voxel CONTAINING the query (coarser prefix of the
    fine voxel coords)."""
    octree, ph, pyramids, exsum, level = sphere
    vox = np.asarray(unbatched_get_level_points(ph, pyramids[0], level))
    centers = (vox + 0.5) / (2 ** (level - 1)) - 1.0
    q = jnp.asarray(centers[:20], jnp.float32)
    pidx_all = unbatched_query(octree, exsum, q, level, with_parents=True)
    assert pidx_all.shape == (20, level + 1)
    ph_np = np.asarray(ph)
    for li in range(level + 1):
        ids = np.asarray(pidx_all[:, li])
        assert (ids >= 0).all()
        coarse = ph_np[ids]
        np.testing.assert_array_equal(coarse, vox[:20] >> (level - li))
    # the last column equals the plain query
    plain = unbatched_query(octree, exsum, q, level)
    np.testing.assert_array_equal(np.asarray(pidx_all[:, -1]),
                                  np.asarray(plain))


def test_query_misses_give_minus_one(sphere):
    octree, ph, pyramids, exsum, level = sphere
    # center of the sphere is hollow at the surface-shell octree
    q = jnp.asarray([[0., 0., 0.], [0.99, 0.99, 0.99]], jnp.float32)
    pidx = unbatched_query(octree, exsum, q, level)
    assert int(pidx[0]) == -1 and int(pidx[1]) == -1


def test_spc_make_dense_and_from_features():
    level = 2
    spc = Spc.make_dense(level)
    assert int(spc.num_points(level)[0]) == (2 ** level) ** 3
    # from_features: occupancy mask selects cells
    grid = np.zeros((1, 1, 4, 4, 4), np.float32)
    grid[0, 0, 0, 0, 0] = 1.
    grid[0, 0, 3, 2, 1] = 2.
    masks = jnp.asarray(grid[:, 0] != 0)
    spc2 = Spc.from_features(jnp.asarray(grid), masks)
    assert int(spc2.num_points(2)[0]) == 2
    vals = sorted(float(v) for v in np.asarray(spc2.features).reshape(-1))
    assert vals == [1., 2.]


def test_spc_from_list_batches_octrees():
    o1 = unbatched_points_to_octree(
        jnp.asarray([[0, 0, 0]], jnp.int16), 1)
    o2 = unbatched_points_to_octree(
        jnp.asarray([[0, 0, 0], [1, 1, 1]], jnp.int16), 1)
    spc = Spc.from_list([o1, o2])
    assert spc.batch_size == 2
    assert int(spc.pyramids[0][0, 1]) == 1
    assert int(spc.pyramids[1][0, 1]) == 2


def test_random_spc_octrees_are_valid():
    from kaolin_tpu.ops.random import random_spc_octrees, manual_seed
    from kaolin_tpu.utils.testing import check_spc_octrees
    manual_seed(7)
    octrees, lengths = random_spc_octrees(3, max_level=3)
    check_spc_octrees(octrees, lengths)
    max_level, pyramids, exsum = scan_octrees(octrees, np.asarray(lengths))
    assert max_level == 3
    assert pyramids.shape[0] == 3


def test_morton_sort_equals_coord_lexsort():
    """Morton order at one level equals z-order of interleaved bits —
    cross-check against a numpy bit-interleave."""
    rng = np.random.default_rng(5)
    pts = np.unique(rng.integers(0, 16, (200, 3)), axis=0).astype(np.int16)
    m = np.asarray(points_to_morton(jnp.asarray(pts)))
    def interleave(p):
        out = 0
        for b in range(4):
            for ax, sh in ((0, 2), (1, 1), (2, 0)):
                out |= ((int(p[ax]) >> b) & 1) << (3 * b + sh)
        return out
    ref = np.asarray([interleave(p) for p in pts])
    np.testing.assert_array_equal(m, ref)
    back = np.asarray(morton_to_points(jnp.asarray(m)))
    np.testing.assert_array_equal(back, pts)
