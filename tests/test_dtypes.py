"""dtype grid over the numeric core: float32 / float64 / bfloat16.

The reference parametrizes device x dtype everywhere
(``kaolin/utils/testing.py:34-42 FLOAT_TYPES``,
``tests/python/kaolin/render/mesh/test_dibr.py:36-40`` runs float AND
double). This module is the TPU-build analogue: each op family runs on
all three float dtypes, asserting (a) the output dtype follows the input
dtype and (b) values agree with a float64 reference within a
per-dtype tolerance (bf16 ~ 2-3 significant digits).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kaolin_tpu as kal
from kaolin_tpu.render.camera import CameraExtrinsics

DTYPES = [jnp.float32, jnp.float64, jnp.bfloat16]
TOL = {jnp.float32: dict(rtol=1e-5, atol=1e-5),
       jnp.float64: dict(rtol=1e-12, atol=1e-12),
       jnp.bfloat16: dict(rtol=3e-2, atol=3e-2)}


def _f64(x):
    return np.asarray(x, np.float64)


def _assert_close(x, ref, dtype, **over):
    tol = dict(TOL[dtype])
    tol.update(over)
    np.testing.assert_allclose(_f64(x), _f64(ref), **tol)


@pytest.fixture(scope='module')
def cloud_pair():
    rng = np.random.default_rng(0)
    return rng.normal(size=(1, 300, 3)), rng.normal(size=(1, 200, 3))


@pytest.fixture(scope='module')
def small_mesh():
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    return v, f


@pytest.mark.parametrize('dtype', DTYPES)
def test_chamfer_and_sided_dtype(cloud_pair, dtype):
    p1, p2 = cloud_pair
    d = kal.metrics.pointcloud.chamfer_distance(
        jnp.asarray(p1, dtype), jnp.asarray(p2, dtype))
    ref = kal.metrics.pointcloud.chamfer_distance(
        jnp.asarray(p1, jnp.float64), jnp.asarray(p2, jnp.float64))
    assert d.dtype == dtype
    _assert_close(d, ref, dtype, rtol=5e-2 if dtype == jnp.bfloat16
                  else TOL[dtype]['rtol'])
    sd, idx = kal.metrics.pointcloud.sided_distance(
        jnp.asarray(p1, dtype), jnp.asarray(p2, dtype), backend='xla')
    assert sd.dtype == dtype and idx.dtype == jnp.int32


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.float64])
def test_point_to_mesh_dtype(small_mesh, dtype):
    v, f = small_mesh
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1, 100, 3)) * 0.8
    fv = v[f][None]
    dist, idx, types = kal.metrics.trianglemesh.point_to_mesh_distance(
        jnp.asarray(pts, dtype), jnp.asarray(fv, dtype), backend='xla')
    ref = kal.metrics.trianglemesh.point_to_mesh_distance(
        jnp.asarray(pts, jnp.float64), jnp.asarray(fv, jnp.float64),
        backend='xla')
    assert dist.dtype == dtype
    _assert_close(dist, ref[0], dtype)
    # winner faces agree except genuine near-ties (the icosphere's
    # symmetry puts ~8% of random points near equidistant face pairs)
    agree = (np.asarray(idx) == np.asarray(ref[1])).mean()
    assert agree > 0.9, agree


@pytest.mark.parametrize('dtype', DTYPES)
def test_mesh_ops_dtype(small_mesh, dtype):
    v, f = small_mesh
    verts = jnp.asarray(v[None], dtype)
    faces = jnp.asarray(f, jnp.int32)
    areas = kal.ops.mesh.face_areas(verts, faces)
    normals = kal.ops.mesh.face_normals(
        kal.ops.mesh.index_vertices_by_faces(verts, faces), unit=True)
    assert areas.dtype == dtype and normals.dtype == dtype
    ref_a = kal.ops.mesh.face_areas(jnp.asarray(v[None]), faces)
    _assert_close(areas, ref_a, dtype)
    nrm = np.linalg.norm(_f64(normals), axis=-1)
    np.testing.assert_allclose(nrm, 1., atol=3e-2
                               if dtype == jnp.bfloat16 else 1e-5)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.float64])
def test_camera_dtype(dtype):
    eye = jnp.asarray([1., 2., 3.], dtype)
    ext = CameraExtrinsics.from_lookat(
        eye=eye, at=jnp.zeros(3, dtype), up=jnp.asarray([0., 1., 0.], dtype))
    vm = ext.view_matrix()
    assert vm.dtype == dtype
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)), dtype)
    cam_pts = ext.transform(pts)
    back, _ = ext.inv_transform_rays(cam_pts, cam_pts)
    _assert_close(back[0], pts, dtype,
                  atol=1e-10 if dtype == jnp.float64 else 1e-5)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.float64])
def test_legacy_camera_and_rasterize_dtype(small_mesh, dtype):
    """The reference's double-parametrized DIB-R surface: the full
    prepare_vertices -> rasterize -> soft mask chain at each dtype."""
    v, f = small_mesh
    H = W = 32
    verts = jnp.asarray(v[None] * 0.5, dtype)
    faces = jnp.asarray(f, jnp.int32)
    rot, trans = kal.render.camera.generate_rotate_translate_matrices(
        jnp.asarray([[0., 0., 3.]], dtype), jnp.zeros((1, 3), dtype),
        jnp.asarray([[0., 1., 0.]], dtype))
    proj = kal.render.camera.generate_perspective_projection(
        math.pi / 4., dtype=dtype)
    fvc, fvi, fn = kal.render.mesh.prepare_vertices(
        verts, faces, proj, camera_rot=rot, camera_trans=trans)
    assert fvc.dtype == dtype and fvi.dtype == dtype
    ff = jnp.ones(fvc.shape[:3] + (1,), dtype)
    feats, mask, fidx = kal.render.mesh.dibr_rasterization(
        H, W, fvc[..., 2], fvi, ff, fn[..., 2], rast_backend='xla',
        mask_backend='xla')
    assert feats.dtype == dtype and mask.dtype == dtype
    assert int((np.asarray(fidx) >= 0).sum()) > 20
    ref = kal.render.mesh.dibr_rasterization(
        H, W, jnp.float64(1) * fvc[..., 2], jnp.asarray(fvi, jnp.float64),
        jnp.asarray(ff, jnp.float64), jnp.asarray(fn[..., 2], jnp.float64),
        rast_backend='xla', mask_backend='xla')
    # face selection identical across dtypes on this scene
    np.testing.assert_array_equal(np.asarray(fidx), np.asarray(ref[2]))
    _assert_close(mask, ref[1], dtype, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('dtype', DTYPES)
def test_sh_lighting_dtype(dtype):
    n = np.random.default_rng(3).normal(size=(50, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    coeffs = jnp.asarray(np.linspace(0.1, 1., 9), dtype)
    out = kal.render.lighting.sh9_irradiance(coeffs, jnp.asarray(n, dtype))
    ref = kal.render.lighting.sh9_irradiance(
        jnp.asarray(np.linspace(0.1, 1., 9)), jnp.asarray(n))
    assert out.dtype == dtype
    _assert_close(out, ref, dtype, rtol=5e-2 if dtype == jnp.bfloat16
                  else 1e-5, atol=5e-2 if dtype == jnp.bfloat16 else 1e-6)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.float64])
def test_gradients_dtype(small_mesh, dtype):
    """Gradient dtype follows the primal dtype through the DIB-R chain
    (double-precision gradcheck surface of the reference)."""
    v, f = small_mesh
    H = W = 16
    faces = jnp.asarray(f, jnp.int32)
    rot, trans = kal.render.camera.generate_rotate_translate_matrices(
        jnp.asarray([[0., 0., 3.]], dtype), jnp.zeros((1, 3), dtype),
        jnp.asarray([[0., 1., 0.]], dtype))
    proj = kal.render.camera.generate_perspective_projection(
        math.pi / 4., dtype=dtype)

    def loss(verts):
        fvc, fvi, fn = kal.render.mesh.prepare_vertices(
            verts, faces, proj, camera_rot=rot, camera_trans=trans)
        ff = jnp.ones(fvc.shape[:3] + (1,), dtype)
        _, mask, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2], rast_backend='xla',
            mask_backend='xla')
        return jnp.sum(mask ** 2)

    g = jax.grad(loss)(jnp.asarray(v[None] * 0.5, dtype))
    assert g.dtype == dtype
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.
