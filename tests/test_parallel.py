"""Multi-device sharding correctness: sharded render over an 8-device CPU
mesh vs the single-device reference (the naive-vs-kernel analogue for the
distributed layer, SURVEY §4.9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.parallel import make_mesh, sharded_dibr_rasterization
from kaolin_tpu.render.mesh import dibr_rasterization
from kaolin_tpu.metrics.render import mask_iou


@pytest.fixture(scope='module')
def inputs():
    rng = np.random.default_rng(3)
    B, F = 2, 40
    centers = rng.uniform(-0.8, 0.8, (B, F, 1, 2))
    fvi = jnp.asarray(centers + rng.uniform(-0.15, 0.15, (B, F, 3, 2)))
    fvz = jnp.asarray(-rng.uniform(1., 3., (B, F, 3)))
    ff = jnp.asarray(rng.normal(size=(B, F, 3, 3)))
    fnz = jnp.asarray(rng.uniform(-1., 1., (B, F)))
    return fvz, fvi, ff, fnz


@pytest.mark.parametrize('data,pix', [(1, 8), (2, 4), (2, 1)])
def test_sharded_dibr_matches_single(inputs, data, pix):
    if jax.device_count() < data * pix:
        pytest.skip('not enough devices')
    fvz, fvi, ff, fnz = inputs
    H, W = 64, 128
    mesh = make_mesh(data=data, pix=pix, devices=jax.devices()[:data * pix])
    ref_feat, ref_mask, ref_idx = dibr_rasterization(
        H, W, fvz, fvi, ff, fnz, rast_backend='xla')
    feat, mask, idx = jax.jit(lambda *a: sharded_dibr_rasterization(
        mesh, H, W, *a, rast_backend='xla'))(fvz, fvi, ff, fnz)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref_feat),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask),
                               rtol=1e-6, atol=1e-9)


def test_sharded_gradients_match_single(inputs):
    if jax.device_count() < 8:
        pytest.skip('not enough devices')
    fvz, fvi, ff, fnz = inputs
    H, W = 64, 128
    mesh = make_mesh(data=2, pix=4)
    target = jnp.zeros((2, H, W))

    def loss_single(fvi_, ff_):
        feat, mask, _ = dibr_rasterization(H, W, fvz, fvi_, ff_, fnz,
                                           rast_backend='xla')
        return jnp.sum(feat ** 2) * 1e-2 + mask_iou(mask, target + 0.5)

    def loss_sharded(fvi_, ff_):
        feat, mask, _ = sharded_dibr_rasterization(mesh, H, W, fvz, fvi_,
                                                   ff_, fnz,
                                                   rast_backend='xla')
        return jnp.sum(feat ** 2) * 1e-2 + mask_iou(mask, target + 0.5)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(fvi, ff)
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(fvi, ff)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_sharded_raytrace_matches_single():
    """Ray-sharded SPC trace over the CPU mesh == single-device trace."""
    if jax.device_count() < 8:
        pytest.skip('not enough devices')
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points)
    from kaolin_tpu.render.spc import (unbatched_raytrace_fixed,
                                       generate_primary_rays)
    from kaolin_tpu.parallel import sharded_raytrace, make_mesh

    level = 5
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(2000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    octree = unbatched_points_to_octree(
        quantize_points(jnp.asarray(dirs * 0.7, jnp.float32), level), level)
    _, pyramids, exsum = scan_octrees(octree,
                                      np.array([len(np.asarray(octree))]))
    ph = generate_points(octree, pyramids, exsum)
    H = W = 16
    o, d = generate_primary_rays(H, W, jnp.asarray([0., 0., 2.5]),
                                 jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                 jnp.pi / 4)
    mesh = make_mesh(data=1, pix=8)
    CAP = 4096
    ridx, pidx, depth, counts = sharded_raytrace(
        mesh, octree, ph, exsum, o, d, level, CAP)
    n_per = o.shape[0] // 8
    ridx, pidx = np.asarray(ridx), np.asarray(pidx)
    depth, counts = np.asarray(depth), np.asarray(counts)
    for s in range(8):
        ref = unbatched_raytrace_fixed(
            octree, ph, exsum, o[s * n_per:(s + 1) * n_per],
            d[s * n_per:(s + 1) * n_per], level, CAP)
        c = int(counts[s])
        assert c == int(ref[3])
        lo = s * CAP
        np.testing.assert_array_equal(ridx[lo:lo + c],
                                      np.asarray(ref[0])[:c])
        np.testing.assert_array_equal(pidx[lo:lo + c],
                                      np.asarray(ref[1])[:c])
        np.testing.assert_allclose(depth[lo:lo + c, 0],
                                   np.asarray(ref[2])[:c, 0], rtol=1e-6)


def test_sharded_raytrace_ray_fn_planned_caps():
    """ray_fn recompute + plan_sharded_raytrace schedule: each shard's
    intersection stream matches an unsharded trace of its ray slice."""
    if jax.device_count() < 8:
        pytest.skip('not enough devices')
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points)
    from kaolin_tpu.render.spc import (unbatched_raytrace_fixed,
                                       primary_rays_fn)
    from kaolin_tpu.parallel import sharded_raytrace, make_mesh
    from kaolin_tpu.parallel.spc import plan_sharded_raytrace

    level = 5
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(2000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    octree = unbatched_points_to_octree(
        quantize_points(jnp.asarray(dirs * 0.7, jnp.float32), level), level)
    _, pyramids, exsum = scan_octrees(octree,
                                      np.array([len(np.asarray(octree))]))
    ph = generate_points(octree, pyramids, exsum)
    H = W = 16
    ray_fn = primary_rays_fn(H, W, jnp.asarray([0., 0., 2.5]),
                             jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                             jnp.pi / 4)
    o, d = ray_fn(jnp.arange(H * W, dtype=jnp.int32))
    mesh = make_mesh(data=1, pix=8)
    sched, cap = plan_sharded_raytrace(8, octree, ph, exsum, o, d,
                                       level, ray_fn=ray_fn)
    ridx, pidx, depth, counts = sharded_raytrace(
        mesh, octree, ph, exsum, o, d, level, cap,
        cap_schedule=sched, ray_fn=ray_fn)
    n_per = o.shape[0] // 8
    ridx, pidx = np.asarray(ridx), np.asarray(pidx)
    depth, counts = np.asarray(depth), np.asarray(counts)
    for s in range(8):
        off = jnp.int32(s * n_per)
        ref = unbatched_raytrace_fixed(
            octree, ph, exsum, o[s * n_per:(s + 1) * n_per],
            d[s * n_per:(s + 1) * n_per], level, cap,
            cap_schedule=sched,
            ray_fn=lambda r, off=off: ray_fn(r + off))
        c = int(counts[s])
        assert c == int(ref[3])
        lo = s * cap
        np.testing.assert_array_equal(ridx[lo:lo + c],
                                      np.asarray(ref[0])[:c])
        np.testing.assert_array_equal(pidx[lo:lo + c],
                                      np.asarray(ref[1])[:c])
        np.testing.assert_allclose(depth[lo:lo + c, 0],
                                   np.asarray(ref[2])[:c, 0], rtol=1e-6)


def test_sharded_metrics_match_single_device():
    """Sharded chamfer / sided / point-to-mesh vs single-device, grads
    included (8 virtual CPU devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.parallel import (make_mesh, sharded_sided_distance,
                                     sharded_chamfer_distance,
                                     sharded_point_to_mesh_distance)
    from kaolin_tpu.metrics.pointcloud import sided_distance, chamfer_distance
    from kaolin_tpu.metrics.trianglemesh import point_to_mesh_distance

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.random((2, 64, 3)), jnp.float32)
    p2 = jnp.asarray(rng.random((2, 96, 3)), jnp.float32)
    fv = jnp.asarray(rng.random((2, 40, 3, 3)), jnp.float32)

    d_ref, i_ref = sided_distance(p1, p2)
    d_sh, i_sh = sharded_sided_distance(mesh, p1, p2)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))

    c_ref = chamfer_distance(p1, p2)
    c_sh = sharded_chamfer_distance(mesh, p1, p2)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref),
                               rtol=1e-6)

    dm_ref, im_ref, tm_ref = point_to_mesh_distance(p1, fv)
    dm_sh, im_sh, tm_sh = sharded_point_to_mesh_distance(mesh, p1, fv)
    np.testing.assert_allclose(np.asarray(dm_sh), np.asarray(dm_ref),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(im_sh), np.asarray(im_ref))
    np.testing.assert_array_equal(np.asarray(tm_sh), np.asarray(tm_ref))

    # gradients: replicated operand gets psum-reduced partials
    g_ref = jax.grad(lambda a, b: chamfer_distance(a, b).sum(),
                     argnums=(0, 1))(p1, p2)
    g_sh = jax.grad(
        lambda a, b: sharded_chamfer_distance(mesh, a, b).sum(),
        argnums=(0, 1))(p1, p2)
    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_init_distributed_single_process_noop():
    from kaolin_tpu.parallel import init_distributed, is_distributed
    pid, pcount = init_distributed()
    assert (pid, pcount) == (0, 1)
    assert not is_distributed()
    # idempotent
    assert init_distributed() == (0, 1)


def test_make_mesh_multiprocess_layout():
    """Simulated multi-host layout: 'pix' rows must stay within one
    process (ICI), 'data' crosses processes (DCN)."""
    from kaolin_tpu.parallel.mesh import make_mesh

    class FakeDev:
        def __init__(self, i, proc):
            self.id = i
            self.process_index = proc
        def __repr__(self):
            return f'd{self.id}p{self.process_index}'

    devs = [FakeDev(i, i // 4) for i in range(8)]  # 2 procs x 4 devices
    mesh = make_mesh(devices=devs)
    assert mesh.devices.shape == (2, 4)  # data=procs, pix=local
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1
    # explicit pix that would cross hosts is rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_mesh(data=1, pix=8, devices=devs)
    # shuffled input still lands process-major
    mesh2 = make_mesh(data=4, pix=2, devices=devs[::-1])
    for row in mesh2.devices:
        assert len({d.process_index for d in row}) == 1
