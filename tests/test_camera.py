"""Camera API: extrinsics/intrinsics/Camera behavior and
differentiability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.camera import (Camera, CameraExtrinsics,
                                      PinholeIntrinsics,
                                      OrthographicIntrinsics, CameraFOV,
                                      blender_coords)


def test_lookat_view_matrix_origin():
    ext = CameraExtrinsics.from_lookat(eye=jnp.asarray([0., 0., 3.]),
                                       at=jnp.zeros(3),
                                       up=jnp.asarray([0., 1., 0.]))
    vm = np.asarray(ext.view_matrix())[0]
    # camera at (0,0,3) looking at origin: view matrix maps (0,0,3)->origin
    p = vm @ np.array([0., 0., 3., 1.])
    np.testing.assert_allclose(p[:3], 0., atol=1e-6)
    # a point at the origin should map to z=-3 (in front of camera)
    p = vm @ np.array([0., 0., 0., 1.])
    np.testing.assert_allclose(p[:3], [0., 0., -3.], atol=1e-6)


def test_from_camera_pose_roundtrip():
    rng = np.random.default_rng(0)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pos = rng.normal(size=(3,))
    ext = CameraExtrinsics.from_camera_pose(jnp.asarray(pos, jnp.float64),
                                            jnp.asarray(q.T, jnp.float64))
    np.testing.assert_allclose(np.asarray(ext.cam_pos())[0, :, 0], pos,
                               atol=1e-6)


def test_backend_switch_consistency():
    ext = CameraExtrinsics.from_lookat(eye=jnp.asarray([1., 2., 3.]),
                                       at=jnp.zeros(3),
                                       up=jnp.asarray([0., 1., 0.]))
    ext6 = ext.switch_backend('matrix_6dof_rotation')
    np.testing.assert_allclose(np.asarray(ext.view_matrix()),
                               np.asarray(ext6.view_matrix()), atol=1e-6)
    assert ext6.params.shape == (1, 9)


def test_transform_inv_rays_roundtrip():
    ext = CameraExtrinsics.from_lookat(eye=jnp.asarray([1., 2., 3.]),
                                       at=jnp.zeros(3),
                                       up=jnp.asarray([0., 1., 0.]))
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(7, 3)),
                      jnp.float32)
    cam_pts = ext.transform(pts)
    back, _ = ext.inv_transform_rays(cam_pts, cam_pts)
    np.testing.assert_allclose(np.asarray(back)[0], np.asarray(pts),
                               atol=1e-5)


def test_movement_ops():
    ext = CameraExtrinsics.from_lookat(eye=jnp.asarray([0., 0., 3.]),
                                       at=jnp.zeros(3),
                                       up=jnp.asarray([0., 1., 0.]))
    moved = ext.move_forward(1.0)
    # reference convention: 'forward' is the camera-space +z axis, which
    # points BACKWARD from the viewing direction (extrinsics.py:898)
    np.testing.assert_allclose(np.asarray(moved.cam_pos())[0, :, 0],
                               [0., 0., 4.], atol=1e-5)
    rotated = ext.rotate(yaw=np.pi)
    fwd0 = np.asarray(ext.cam_forward())[0, :, 0]
    fwd1 = np.asarray(rotated.cam_forward())[0, :, 0]
    np.testing.assert_allclose(fwd1, -fwd0, atol=1e-5)
    translated = ext.translate(jnp.asarray([1., 0., 0.]))
    np.testing.assert_allclose(np.asarray(translated.cam_pos())[0, :, 0],
                               [1., 0., 3.], atol=1e-5)


def test_change_coordinate_system_roundtrip():
    ext = CameraExtrinsics.from_lookat(eye=jnp.asarray([0., 1., 3.]),
                                       at=jnp.zeros(3),
                                       up=jnp.asarray([0., 1., 0.]))
    changed = ext.change_coordinate_system(blender_coords())
    restored = changed.reset_coordinate_system()
    np.testing.assert_allclose(np.asarray(ext.view_matrix()),
                               np.asarray(restored.view_matrix()),
                               atol=1e-5)


def test_pinhole_projection_center():
    cam = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=np.pi / 4, width=256, height=256)
    assert isinstance(cam.intrinsics, PinholeIntrinsics)
    # point at origin projects to NDC center
    out = np.asarray(cam.transform(jnp.zeros((1, 3))))
    np.testing.assert_allclose(out[0, 0, :2], 0., atol=1e-6)
    # fov roundtrip
    np.testing.assert_allclose(
        np.asarray(cam.intrinsics.fov(in_degrees=False))[0],
        np.pi / 4, rtol=1e-5)


def test_pinhole_projection_offset_points():
    cam = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=np.pi / 2, width=128, height=128)
    # with fov 90deg, a point at x=z distance maps to ndc x=+-1 boundary
    out = np.asarray(cam.transform(jnp.asarray([[3., 0., 0.]])))
    np.testing.assert_allclose(abs(out[0, 0, 0]), 1., rtol=1e-4)


def test_view_projection_matches_transform():
    cam = Camera.from_args(eye=jnp.asarray([1., 1., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=np.pi / 4, width=64, height=64)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                      jnp.float32)
    via_transform = np.asarray(cam.transform(pts))
    vp = np.asarray(cam.view_projection_matrix())[0]
    hom = np.concatenate([np.asarray(pts), np.ones((5, 1))], -1)
    proj = (vp @ hom.T).T
    proj = proj[:, :3] / proj[:, 3:]
    np.testing.assert_allclose(via_transform[0], proj, rtol=1e-4, atol=1e-5)


def test_ortho_camera():
    cam = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov_distance=2.0, width=128, height=128)
    assert isinstance(cam.intrinsics, OrthographicIntrinsics)
    # parallel projection: x offset scales by 1/fov_distance, z ignored
    # for xy
    a = np.asarray(cam.transform(jnp.asarray([[0.5, 0., 0.]])))
    b = np.asarray(cam.transform(jnp.asarray([[0.5, 0., 1.]])))
    np.testing.assert_allclose(a[0, 0, :2], b[0, 0, :2], atol=1e-6)


def test_camera_cat_and_index():
    def mk(z):
        return Camera.from_args(eye=jnp.asarray([0., 0., z]),
                                at=jnp.zeros(3),
                                up=jnp.asarray([0., 1., 0.]),
                                fov=np.pi / 4, width=64, height=64)

    cam = Camera.cat([mk(3.), mk(5.)])
    assert len(cam) == 2
    np.testing.assert_allclose(
        np.asarray(cam[1].extrinsics.cam_pos())[0, :, 0], [0., 0., 5.],
        atol=1e-5)


def test_camera_differentiable_6dof():
    """Camera pose optimization through the 6-DoF backend."""
    target = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)),
                         jnp.float64)
    ext = CameraExtrinsics.from_lookat(
        eye=jnp.asarray([0., 0., 3.]), at=jnp.zeros(3),
        up=jnp.asarray([0., 1., 0.]),
        backend='matrix_6dof_rotation', dtype=jnp.float64)
    goal = ext.rotate(yaw=0.3).translate(jnp.asarray([0.2, 0., 0.]))
    goal_pts = goal.transform(target)

    def loss(params):
        e = CameraExtrinsics(params, backend='matrix_6dof_rotation')
        return jnp.mean((e.transform(target) - goal_pts) ** 2)

    params = ext.params
    for _ in range(200):
        g = jax.grad(loss)(params)
        params = params - 0.1 * g
    assert float(loss(params)) < 1e-5


def test_camera_in_jit():
    cam = Camera.from_args(eye=jnp.asarray([0., 0., 3.]),
                           at=jnp.zeros(3),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=np.pi / 4, width=64, height=64)

    @jax.jit
    def project(cam, pts):
        return cam.transform(pts)

    pts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)),
                      jnp.float32)
    out = project(cam, pts)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(cam.transform(pts)), atol=1e-6)


def test_pose_optimization_through_rendering():
    """Camera pose gradients through the full DIB-R soft-mask pipeline
    (BASELINE config 2: pose/camera gradients)."""
    import kaolin_tpu as kal
    import optax

    # icosahedron
    t = (1. + 5 ** .5) / 2.
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int32)
    # squashed so the silhouette is orientation-sensitive
    verts = jnp.asarray(v * np.array([0.6, 0.33, 0.45], np.float32))[None]
    faces = jnp.asarray(f)
    H = W = 64
    proj = kal.render.camera.generate_perspective_projection(
        np.pi / 4).astype(jnp.float32)

    def render_mask(transform):
        fvc, fvi, fn = kal.render.mesh.prepare_vertices(
            verts, faces, proj, camera_transform=transform)
        ff = jnp.ones(fvc.shape[:3] + (1,), jnp.float32)
        _, sm, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2], sigmainv=700,
            rast_backend='xla', mask_backend='xla')
        return sm

    def tf_from_eye(eye):
        # legacy differentiable lookat path (4, 3) row-vector transform
        return kal.render.camera.generate_transformation_matrix(
            eye[None].astype(jnp.float32),
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([[0., 1., 0.]], jnp.float32))

    target = jax.lax.stop_gradient(
        render_mask(tf_from_eye(jnp.asarray([0.5, 0.3, 2.5]))))

    def loss_fn(eye):
        return kal.metrics.render.mask_iou(render_mask(tf_from_eye(eye)),
                                           target)

    eye0 = jnp.asarray([0., 0., 2.5], jnp.float32)
    opt = optax.adam(3e-2)
    state = opt.init(eye0)
    eye = eye0
    l0 = float(loss_fn(eye0))
    step = jax.jit(lambda e, s: (lambda g: opt.update(g[1], s))(
        jax.value_and_grad(loss_fn)(e)))
    for _ in range(150):
        up, state = step(eye, state)
        eye = optax.apply_updates(eye, up)
    l1 = float(loss_fn(eye))
    assert np.isfinite(l1)
    # the soft-mask blur gives a nonzero loss floor even at the true
    # pose; compare against it rather than zero
    floor = float(loss_fn(jnp.asarray([0.5, 0.3, 2.5], jnp.float32)))
    assert l1 - floor < 0.15 * (l0 - floor), (l0, l1, floor)
    np.testing.assert_allclose(np.asarray(eye), [0.5, 0.3, 2.5],
                               atol=0.05)
