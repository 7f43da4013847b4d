"""Camera intrinsics: pinhole + orthographic lens modules (projection
invariants, the three supported NDC depth ranges, zoom semantics,
fov/focal round-trips, depth normalization). The reference
parametrizes these in tests/python/kaolin/render/camera/."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.camera import (Camera, PinholeIntrinsics,
                                      OrthographicIntrinsics,
                                      CameraExtrinsics)
from kaolin_tpu.render.camera.intrinsics import CameraFOV


def test_pinhole_fov_focal_roundtrip():
    cam = PinholeIntrinsics.from_fov(640, 480, fov=math.radians(60.),
                                     fov_direction=CameraFOV.VERTICAL)
    fov = np.asarray(cam.fov(CameraFOV.VERTICAL, in_degrees=True))
    np.testing.assert_allclose(fov, 60., rtol=1e-5)
    cam2 = PinholeIntrinsics.from_focal(640, 480,
                                        focal_x=float(cam.focal_x[0]),
                                        focal_y=float(cam.focal_y[0]))
    np.testing.assert_allclose(np.asarray(cam2.fov_y), np.asarray(cam.fov_y),
                               rtol=1e-5)


def test_pinhole_projection_center_maps_to_origin():
    cam = PinholeIntrinsics.from_fov(64, 64, fov=math.radians(45.))
    pts = jnp.asarray([[[0., 0., -2.]]])
    out = np.asarray(cam.transform(pts))
    np.testing.assert_allclose(out[0, 0, :2], 0., atol=1e-6)


@pytest.mark.parametrize('ndc_min,ndc_max', [(-1., 1.), (0., 1.), (1., 0.)])
def test_pinhole_ndc_depth_ranges(ndc_min, ndc_max):
    """Points at the near/far planes land on the configured NDC depth
    endpoints — covers the reference's [-1,1], [0,1], and reversed-z
    [1,0] conventions (intrinsics_pinhole.py:435-446)."""
    near, far = 0.1, 10.0
    cam = PinholeIntrinsics.from_fov(64, 64, fov=math.radians(45.), near=near, far=far,
                                     ndc_min=ndc_min, ndc_max=ndc_max)
    pts = jnp.asarray([[[0., 0., -near], [0., 0., -far]]])
    out = np.asarray(cam.transform(pts))
    np.testing.assert_allclose(out[0, 0, 2], ndc_min, atol=1e-5)
    np.testing.assert_allclose(out[0, 1, 2], ndc_max, atol=1e-4)


def test_pinhole_zoom_narrows_fov():
    cam = PinholeIntrinsics.from_fov(64, 64, fov=math.radians(60.))
    f0 = float(np.asarray(cam.fov_y)[0])
    cam = cam.zoom(10.)
    f1 = float(np.asarray(cam.fov_y)[0])
    assert f1 < f0


def test_pinhole_transform_matches_matrix():
    cam = PinholeIntrinsics.from_fov(64, 48, fov=math.radians(50.))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (1, 20, 3)) - [0, 0, 3]
    proj = np.asarray(cam.projection_matrix())[0]
    h = np.concatenate([pts, np.ones((1, 20, 1))], -1) @ proj.T
    expected = h[..., :3] / h[..., 3:4]
    np.testing.assert_allclose(np.asarray(cam.transform(jnp.asarray(pts))),
                               expected, rtol=1e-4, atol=1e-5)


def test_pinhole_normalize_depth_monotone():
    """normalize_depth maps NDC depths to [0, 1], preserving order,
    for all three NDC conventions (reversed-z flips)."""
    for ndc_min, ndc_max in ((-1., 1.), (0., 1.), (1., 0.)):
        cam = PinholeIntrinsics.from_fov(64, 64, fov=math.radians(45.),
                                         near=0.5, far=5.,
                                         ndc_min=ndc_min, ndc_max=ndc_max)
        lo, hi = min(ndc_min, ndc_max), max(ndc_min, ndc_max)
        ndc = jnp.asarray([np.linspace(lo, hi, 5)])
        nd = np.asarray(cam.normalize_depth(ndc))[0]
        if ndc_min > ndc_max:            # reversed-z: order flips
            nd = nd[::-1]
        assert (np.diff(nd) >= 0).all()
        assert nd.min() >= 0. and nd.max() <= 1.


def test_ortho_parallel_projection():
    """Orthographic: image-plane coords are independent of depth."""
    cam = OrthographicIntrinsics.from_frustum(64, 64, fov_distance=1.0,
                                              near=0.1, far=10.)
    pts = jnp.asarray([[[0.3, -0.2, -1.], [0.3, -0.2, -7.]]])
    out = np.asarray(cam.transform(pts))
    np.testing.assert_allclose(out[0, 0, :2], out[0, 1, :2], atol=1e-6)
    assert out[0, 0, 2] != out[0, 1, 2]


def test_ortho_zoom_scales_extent():
    cam = OrthographicIntrinsics.from_frustum(64, 64, fov_distance=1.0)
    p = jnp.asarray([[[0.4, 0.0, -2.0]]])
    x0 = float(np.asarray(cam.transform(p))[0, 0, 0])
    cam = cam.zoom(-1.0)      # zoom out -> larger fov_distance
    x1 = float(np.asarray(cam.transform(p))[0, 0, 0])
    assert abs(x1) < abs(x0)


def test_camera_from_args_pinhole_and_ortho():
    cam = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=math.radians(45.), width=64, height=64)
    assert isinstance(cam.intrinsics, PinholeIntrinsics)
    vp = np.asarray(cam.view_projection_matrix())
    assert vp.shape[-2:] == (4, 4)
    cam2 = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                            at=jnp.zeros(3),
                            up=jnp.asarray([0., 1., 0.]),
                            fov_distance=1.0, width=64, height=64)
    assert isinstance(cam2.intrinsics, OrthographicIntrinsics)


def test_intrinsics_pytree_roundtrip():
    import jax
    cam = PinholeIntrinsics.from_fov(64, 64, fov=math.radians(45.), near=0.2, far=7.,
                                     ndc_min=0., ndc_max=1.)
    leaves, treedef = jax.tree_util.tree_flatten(cam)
    cam2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert cam2.width == 64 and cam2.near == cam.near
    assert cam2.ndc_min == 0. and cam2.ndc_max == 1.
    np.testing.assert_array_equal(np.asarray(cam2.params),
                                  np.asarray(cam.params))
