"""Systematic finite-difference gradient checks over the
differentiable surface (the reference relies on torch gradcheck +
golden grads; this is the jax analogue: central differences at float64
vs jax.grad on every differentiable op family)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kaolin_tpu as kal


def fd_grad(f, x, eps=1e-5):
    """Central-difference gradient of scalar f at float64 x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=['multi_index'])
    for _ in it:
        i = it.multi_index
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        g[i] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * eps)
    return g


def check(f, x, rtol=5e-4, atol=5e-6, eps=1e-5):
    x64 = jnp.asarray(np.asarray(x, np.float64))
    ad = np.asarray(jax.grad(lambda v: jnp.sum(f(v)))(x64), np.float64)
    fd = fd_grad(lambda v: jnp.sum(f(v)), x, eps=eps)
    np.testing.assert_allclose(ad, fd, rtol=rtol, atol=atol)


def test_chamfer_grad():
    rng = np.random.default_rng(0)
    p1 = rng.normal(size=(1, 12, 3))
    p2 = jnp.asarray(rng.normal(size=(1, 9, 3)))
    check(lambda v: kal.metrics.pointcloud.chamfer_distance(v, p2), p1)
    check(lambda v: kal.metrics.pointcloud.chamfer_distance(
        jnp.asarray(p1), v), rng.normal(size=(1, 9, 3)))


def test_sided_distance_grad():
    rng = np.random.default_rng(1)
    p1 = rng.normal(size=(1, 10, 3))
    p2 = jnp.asarray(rng.normal(size=(1, 7, 3)))
    check(lambda v: kal.metrics.pointcloud.sided_distance(v, p2)[0], p1)


def test_point_to_mesh_grad():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1, 8, 3))
    fv = jnp.asarray(rng.normal(size=(1, 6, 3, 3)))
    check(lambda v: kal.metrics.trianglemesh.point_to_mesh_distance(
        v, fv)[0], pts)
    # grads to the faces through the fixed winner assignment
    check(lambda v: kal.metrics.trianglemesh.point_to_mesh_distance(
        jnp.asarray(pts), v)[0], np.asarray(fv))


def test_trilinear_interp_grad():
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points,
                                    unbatched_make_dual,
                                    unbatched_make_trinkets,
                                    unbatched_interpolate_trilinear)
    from kaolin_tpu.ops.spc import unbatched_query
    level = 3
    rng = np.random.default_rng(3)
    pts = np.unique(rng.integers(0, 2 ** level, (40, 3)), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(pts, jnp.int16),
                                        level)
    _, pyramids, exsum = scan_octrees(octree,
                                      np.array([len(np.asarray(octree))]))
    ph = generate_points(octree, pyramids, exsum)
    phd, pyr_dual = unbatched_make_dual(ph, pyramids[0])
    trinkets, _ = unbatched_make_trinkets(ph, pyramids[0], phd, pyr_dual)
    feats = rng.normal(size=(np.asarray(phd).shape[0], 2))
    centers = (pts + 0.5) / (2 ** (level - 1)) - 1.0
    coords = jnp.asarray(centers[:8])[:, None, :]
    pidx = unbatched_query(octree, exsum,
                           jnp.asarray(pts[:8], jnp.int32), level)

    def f(v):
        return unbatched_interpolate_trilinear(
            coords, pidx, ph, trinkets, v, level)
    check(f, feats)


def test_soft_mask_grad():
    rng = np.random.default_rng(4)
    F = 5
    fvi = (rng.uniform(-0.6, 0.6, (1, F, 1, 2))
           + rng.uniform(-0.4, 0.4, (1, F, 3, 2)))
    fvz = -(rng.uniform(1.5, 3.0, (1, F, 1)) * np.ones((1, 1, 3)))
    feats = jnp.asarray(rng.uniform(0, 1, (1, F, 3, 2)))

    def f(v):
        _, mask, _ = kal.render.mesh.dibr_rasterization(
            12, 12, jnp.asarray(fvz, v.dtype), v, feats.astype(v.dtype),
            jnp.ones((1, F), v.dtype), sigmainv=70)
        return mask
    check(f, fvi, rtol=2e-3, atol=1e-5, eps=3e-6)


def test_rasterize_feature_grad():
    rng = np.random.default_rng(5)
    F = 6
    fvi = jnp.asarray(rng.uniform(-0.7, 0.7, (1, F, 1, 2))
                      + rng.uniform(-0.5, 0.5, (1, F, 3, 2)))
    fvz = jnp.asarray(-(rng.uniform(1.5, 3.0, (1, F, 1))
                        * np.ones((1, 1, 3))))
    feats = rng.uniform(0, 1, (1, F, 3, 2))

    def f(v):
        out, _ = kal.render.mesh.rasterize(
            12, 12, fvz.astype(v.dtype), fvi.astype(v.dtype), v)
        return out ** 2
    check(f, feats)


def test_exponential_integration_grad():
    from kaolin_tpu.render.spc import exponential_integration
    rng = np.random.default_rng(6)
    tau = rng.uniform(0.1, 1.0, (9, 1))
    feats = jnp.asarray(rng.uniform(0, 1, (9, 2)))
    b = jnp.asarray([True, False, False, True, False, True, False,
                     False, False])

    def f(v):
        out, _ = exponential_integration(feats.astype(v.dtype), v, b)
        return out
    check(f, tau)


def test_sg_irradiance_grad():
    from kaolin_tpu.render.lighting import unbatched_reduced_sg_inner_product
    rng = np.random.default_rng(7)
    K, L = 3, 4
    i_amp = rng.uniform(0.5, 1.5, (K, 3))
    i_dir = rng.normal(size=(K, 3))
    i_dir /= np.linalg.norm(i_dir, axis=-1, keepdims=True)
    i_sharp = rng.uniform(1., 5., (K,))
    o_amp = jnp.asarray(rng.uniform(0.5, 1.5, (L, 3)))
    o_dir = rng.normal(size=(L, 3))
    o_dir /= np.linalg.norm(o_dir, axis=-1, keepdims=True)
    o_dir = jnp.asarray(o_dir)
    o_sharp = jnp.asarray(rng.uniform(1., 5., (L,)))

    def f(v):
        return unbatched_reduced_sg_inner_product(
            v, jnp.asarray(i_dir, v.dtype), jnp.asarray(i_sharp, v.dtype),
            o_amp.astype(v.dtype), o_dir.astype(v.dtype),
            o_sharp.astype(v.dtype))
    check(f, i_amp, rtol=1e-3)


def test_laplacian_smoothing_grad():
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    f_ = jnp.asarray([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                      [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                      [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                      [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                      [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                     jnp.int32)

    def f(x):
        sm = kal.metrics.trianglemesh.uniform_laplacian_smoothing(
            x[None], f_)
        return (sm - x[None]) ** 2
    check(f, v)


def _pose_scene():
    """Tiny camera-gradient scene: icosphere seen by one camera."""
    from __graft_entry__ import _icosphere
    verts_np, faces_np = _icosphere(1)
    return (jnp.asarray(verts_np)[None], jnp.asarray(faces_np),
            np.asarray([0.4, 0.6, 2.6]))


def test_camera_pose_grad_6dof():
    """Camera gradients (verdict r4 #2 / r5 #4): an image + soft-mask
    loss differentiated through the 6-DoF ``CameraExtrinsics`` params
    (the reference's camera-optimization representation,
    ``extrinsics_backends.py:205``, auto-switched by
    ``extrinsics.py:1019-1041``) matches finite differences."""
    from kaolin_tpu.render.camera import (CameraExtrinsics,
                                          generate_perspective_projection,
                                          perspective_camera)
    from kaolin_tpu.ops.mesh import index_vertices_by_faces, face_normals

    verts, faces, eye = _pose_scene()
    H = W = 16
    cam_proj = generate_perspective_projection(math.pi / 4., dtype=jnp.float64)
    ext0 = CameraExtrinsics.from_lookat(
        jnp.asarray(eye), jnp.zeros(3), jnp.asarray([0., 1., 0.]),
        dtype=jnp.float64, backend='matrix_6dof_rotation')
    params0 = np.asarray(ext0.parameters())          # (1, 9)

    def f(p):
        dt = p.dtype
        ext = CameraExtrinsics(p, backend='matrix_6dof_rotation')
        vc = ext.transform(verts.astype(dt))
        vi = perspective_camera(vc, cam_proj.astype(dt))
        fvc = index_vertices_by_faces(vc, faces)
        fvi = index_vertices_by_faces(vi, faces)
        fn = face_normals(fvc, unit=True)
        ff = jnp.ones(fvc.shape[:3] + (1,), dt)
        feat, mask, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2], sigmainv=70)
        return jnp.sum(feat) + 3. * jnp.sum(mask)

    check(f, params0, rtol=2e-3, atol=1e-4, eps=3e-6)


def test_camera_pose_grad_legacy():
    """Same check through the legacy DIB-R rot/trans camera path
    (reference ``kaolin/render/camera/legacy.py:22``)."""
    verts, faces, eye = _pose_scene()
    H = W = 16
    cam_proj = kal.render.camera.generate_perspective_projection(
        math.pi / 4., dtype=jnp.float64)
    rot, trans = kal.render.camera.generate_rotate_translate_matrices(
        jnp.asarray([eye]), jnp.zeros((1, 3)), jnp.asarray([[0., 1., 0.]]))
    rot64 = np.asarray(rot, np.float64)
    trans64 = np.asarray(trans, np.float64)

    def render(rot, trans):
        dt = rot.dtype
        fvc, fvi, fn = kal.render.mesh.prepare_vertices(
            verts.astype(dt), faces, cam_proj.astype(dt),
            camera_rot=rot, camera_trans=trans)
        ff = jnp.ones(fvc.shape[:3] + (1,), dt)
        feat, mask, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2], sigmainv=70)
        return jnp.sum(feat) + 3. * jnp.sum(mask)

    check(lambda r: render(r, jnp.asarray(trans64, r.dtype)), rot64,
          rtol=2e-3, atol=1e-4, eps=3e-6)
    check(lambda t: render(jnp.asarray(rot64, t.dtype), t), trans64,
          rtol=2e-3, atol=1e-4, eps=3e-6)


def test_camera_pose_fitting_converges():
    """End-to-end pose optimization: gradient descent on the 6-DoF
    params recovers a perturbed camera (silhouette + image loss drops
    monotonically-ish and substantially)."""
    from kaolin_tpu.render.camera import (CameraExtrinsics,
                                          generate_perspective_projection,
                                          perspective_camera)
    from kaolin_tpu.ops.mesh import index_vertices_by_faces, face_normals

    verts, faces, eye = _pose_scene()
    verts = verts.astype(jnp.float32)
    H = W = 32
    cam_proj = generate_perspective_projection(math.pi / 4.)

    def render(p):
        ext = CameraExtrinsics(p, backend='matrix_6dof_rotation')
        vc = ext.transform(verts)
        vi = perspective_camera(vc, cam_proj)
        fvc = index_vertices_by_faces(vc, faces)
        fvi = index_vertices_by_faces(vi, faces)
        fn = face_normals(fvc, unit=True)
        ff = jnp.ones(fvc.shape[:3] + (1,), jnp.float32)
        feat, mask, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2], sigmainv=70)
        return feat, mask

    ext_t = CameraExtrinsics.from_lookat(
        jnp.asarray(eye, jnp.float32), jnp.zeros(3),
        jnp.asarray([0., 1., 0.]), backend='matrix_6dof_rotation')
    target_feat, target_mask = render(ext_t.parameters())
    p = ext_t.parameters() + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), ext_t.parameters().shape)

    import optax
    opt = optax.adam(5e-3)
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        def loss_fn(p):
            feat, mask = render(p)
            return (jnp.mean(jnp.abs(feat - target_feat))
                    + jnp.mean(jnp.abs(mask - target_mask)))
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, state = opt.update(g, state)
        return optax.apply_updates(p, upd), state, l

    losses = []
    for _ in range(60):
        p, state, l = step(p, state)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0], losses[::10] + [losses[-1]]
