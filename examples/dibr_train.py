"""DIB-R inverse rendering: optimize mesh vertices + texture from
multiview silhouettes and images.

Reference: ``examples/tutorial/ian_dibr.py:373 train()`` /
``ian_fish_optimizer.py:61 train_fish()`` (fork layer), restructured as a
single jitted train step scanned on device (TPU-idiomatic: the whole
epoch runs inside one jit).

Run: ``python -m examples.dibr_train [--steps N] [--res R]``.
"""

import argparse
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import kaolin_tpu as kal
from .spline_mesh import spline_body_mesh  # noqa: F401 (example export)


def icosphere(subdiv=2):
    from __graft_entry__ import _icosphere
    return _icosphere(subdiv)


def make_cameras(num_views, r=3., fovy=math.pi / 4.):
    angles = np.linspace(0., 2 * np.pi, num_views, endpoint=False)
    eye = np.stack([r * np.sin(angles), 0.4 * np.ones_like(angles),
                    r * np.cos(angles)], -1)
    rot, trans = kal.render.camera.generate_rotate_translate_matrices(
        jnp.asarray(eye, jnp.float32), jnp.zeros((num_views, 3)),
        jnp.asarray([[0., 1., 0.]], jnp.float32))
    proj = kal.render.camera.generate_perspective_projection(fovy)
    return rot, trans, proj


def render_views(vertices, faces, face_uvs, texture_map, cam_rot,
                 cam_trans, cam_proj, res, sigmainv=7000):
    fvc, fvi, fn = kal.render.mesh.prepare_vertices(
        jnp.broadcast_to(vertices, (cam_rot.shape[0],) + vertices.shape[1:]),
        faces, cam_proj, camera_rot=cam_rot, camera_trans=cam_trans)
    B = cam_rot.shape[0]
    attrs = [jnp.broadcast_to(face_uvs, (B,) + face_uvs.shape[1:]),
             jnp.ones((B, faces.shape[0], 3, 1))]
    (tex_coords, mask), soft_mask, _ = kal.render.mesh.dibr_rasterization(
        res, res, fvc[..., 2], fvi, attrs, fn[..., 2], sigmainv=sigmainv)
    image = kal.render.mesh.texture_mapping(
        tex_coords, jnp.broadcast_to(texture_map,
                                     (B,) + texture_map.shape[1:]),
        mode='bilinear')
    image = jnp.clip(image * mask, 0., 1.)
    return image, soft_mask


def main(steps=150, res=256, num_views=4, laplacian_weight=0.03,
         lr=5e-3):
    verts_np, faces_np = icosphere(2)
    faces = jnp.asarray(faces_np)
    cam_rot, cam_trans, cam_proj = make_cameras(num_views)

    # spherical UVs + a striped target texture
    theta = np.arctan2(verts_np[:, 0], verts_np[:, 2])
    phi = np.arcsin(np.clip(verts_np[:, 1], -1, 1))
    uvs = jnp.asarray(np.stack([(theta / (2 * np.pi) + 0.5),
                                (phi / np.pi + 0.5)], -1),
                      jnp.float32)[None]
    face_uvs = kal.ops.mesh.index_vertices_by_faces(uvs, faces)
    tex = np.ones((1, 3, 64, 64), np.float32)
    tex[:, 0, ::8] = 0.1
    target_texture = jnp.asarray(tex)

    # target: squashed sphere with the striped texture
    target_vertices = jnp.asarray(
        verts_np[None] * np.array([0.6, 1.0, 0.8]), jnp.float32)
    target_images, target_masks = render_views(
        target_vertices, faces, face_uvs, target_texture, cam_rot,
        cam_trans, cam_proj, res)

    # parameters: vertices + texture
    laplacian = kal.ops.mesh.uniform_laplacian(verts_np.shape[0], faces)
    params = {
        'vertices': jnp.asarray(verts_np[None], jnp.float32),
        'texture': jnp.ones((1, 3, 64, 64), jnp.float32) * 0.5,
    }
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def run(params, state):
        def step(carry, _):
            params, state = carry

            def loss_fn(p):
                images, soft_masks = render_views(
                    p['vertices'], faces, face_uvs, p['texture'], cam_rot,
                    cam_trans, cam_proj, res)
                image_loss = jnp.mean(jnp.abs(images - target_images))
                mask_loss = kal.metrics.render.mask_iou(
                    soft_masks, target_masks)
                lap_loss = jnp.mean(
                    (laplacian @ p['vertices'][0]) ** 2)
                return (image_loss + mask_loss
                        + laplacian_weight * lap_loss)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(grads, state)
            return (optax.apply_updates(params, updates), state), loss

        (params, state), losses = jax.lax.scan(step, (params, state), None,
                                               length=steps)
        return params, state, losses

    t0 = time.perf_counter()
    params, state, losses = run(params, state)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    print(f"{steps} steps x {num_views} views at {res}x{res} "
          f"in {dt:.1f}s ({dt / steps * 1000:.1f} ms/step)")
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}")

    # final chamfer vs the target surface
    pts_opt, _ = kal.ops.mesh.sample_points(params['vertices'], faces, 2048,
                                            key=jax.random.PRNGKey(0))
    pts_tgt, _ = kal.ops.mesh.sample_points(target_vertices, faces, 2048,
                                            key=jax.random.PRNGKey(1))
    cd = float(kal.metrics.pointcloud.chamfer_distance(pts_opt, pts_tgt)[0])
    print(f"chamfer distance to target: {cd:.5f}")
    return losses, cd


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=150)
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--views', type=int, default=4)
    args = p.parse_args()
    main(steps=args.steps, res=args.res, num_views=args.views)
