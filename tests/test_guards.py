"""Fail-loud guard rails added in round 4: precision ceilings on the
traversal tables, VMEM residency cap on the pruned NN kernel, and the
banded backend's requirement checks."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_node_table_exsum_precision_guard():
    from kaolin_tpu.kernels.spc_traverse import build_node_table_t
    octree = jnp.zeros((8,), jnp.uint8)
    bad_exsum = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 1 << 24, 1 << 24],
                            jnp.int32)
    with pytest.raises(ValueError, match='2\\*\\*24'):
        build_node_table_t(octree, bad_exsum)
    ok_exsum = jnp.arange(9, dtype=jnp.int32)
    tbl = build_node_table_t(octree, ok_exsum)
    assert tbl.shape[0] == 8


def test_packed_node_table_guard():
    """Under jit the exsum values are traced, so the guard uses the
    loose static bound (8 bytes of popcount per octree byte): octrees
    large enough that the bound can overflow 2**23 fail loudly."""
    from kaolin_tpu.render.spc.raytrace import unbatched_raytrace_fixed
    n = (1 << 20) + 8                       # 8n >= 2**23
    octree = jnp.zeros((n,), jnp.uint8)
    exsum = jnp.zeros((n + 1,), jnp.int32)
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.ones((4, 3), jnp.float32)
    ph = jnp.zeros((8, 3), jnp.int16)
    with pytest.raises(ValueError, match='2\\*\\*23'):
        unbatched_raytrace_fixed(octree, ph, exsum, o, d, 2, 64,
                                 backend='xla')


def test_pruned_nn_vmem_cap():
    from kaolin_tpu.kernels.nn_distance import (nearest_idx_pruned,
                                                MAX_REF_POINTS)
    p1 = jnp.zeros((1, 8, 3))
    p2 = jnp.zeros((1, MAX_REF_POINTS + 1, 3))
    with pytest.raises(ValueError, match='VMEM'):
        nearest_idx_pruned(p1, p2)


def test_nearest_auto_route_falls_back_above_cap(monkeypatch):
    """The auto route must choose the XLA scan (not a failing Pallas
    compile) above the VMEM residency cap."""
    import kaolin_tpu.kernels.nn_distance as nd
    import kaolin_tpu.metrics.pointcloud as pc
    monkeypatch.setattr(nd, 'MAX_REF_POINTS', 256)
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(1, 300, 3)), jnp.float32)
    idx = pc._nearest(p1, p2, backend='pallas')
    ref = pc._nearest(p1, p2, backend='xla')
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_banded_backend_requires_schedule():
    from kaolin_tpu.render.spc.raytrace import unbatched_raytrace_fixed
    octree = jnp.asarray([255], jnp.uint8)
    exsum = jnp.asarray([0, 8], jnp.int32)
    ph = jnp.zeros((16, 3), jnp.int16)
    o = jnp.zeros((4, 3), jnp.float32) - jnp.asarray([0., 0., 2.])
    d = jnp.broadcast_to(jnp.asarray([0., 0., 1.]), (4, 3))
    with pytest.raises(AssertionError, match='cap_schedule'):
        unbatched_raytrace_fixed(octree, ph, exsum, o, d, 1, 64,
                                 backend='banded')


def test_traverse_banded_cc_level_and_ray_source_asserts():
    from kaolin_tpu.kernels.spc_traverse import (build_node_table_t,
                                                 traverse_banded_cc)
    octree = jnp.asarray([255], jnp.uint8)
    exsum = jnp.asarray([0, 8], jnp.int32)
    ph = jnp.zeros((16, 3), jnp.int16)
    tbl = build_node_table_t(octree, exsum, ph)
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.ones((4, 3), jnp.float32)
    with pytest.raises(AssertionError):
        traverse_banded_cc(tbl, 4, 11, None, origin=o, direction=d,
                           interpret=True)
    with pytest.raises(AssertionError, match='ray source'):
        traverse_banded_cc(tbl, 4, 1, None, interpret=True)
    with pytest.raises(AssertionError, match='ray source'):
        traverse_banded_cc(tbl, 4, 1, None, origin=o, direction=d,
                           ray_fn=lambda r: (o, d), interpret=True)
