"""Benchmark suite: the five BASELINE.json workload configs, one JSON
line each (ms per unit of work, single chip).

`bench.py` remains the headline metric (config-2-shaped DIB-R 512^2);
this suite tracks the full workload envelope:

1. DIB-R 256^2 silhouette-loss vertex optimization step (config 1).
2. DIB-R 512^2 textured + Lambertian, batch 8, pose/vertex grads
   (config 2).
3. 100k-point chamfer + point_to_mesh_distance (config 3).
4. DefTet volumetric render fwd+bwd (config 4).
5. SPC raytrace 256^2 rays at level 8 (config 5; see bench_raytrace.py
   for the deep-dive harness).

Timing: iterations chained inside one jit via lax.scan, best of
``--reps`` repeats (per-call host timing is meaningless through the
shared axon TPU tunnel — see CLAUDE.md).
"""

import argparse
import json
import time

import numpy as np


def _time(fn, arg, iters, reps=3):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (fn(c), None), a, None, length=iters)[0])
    jax.block_until_ready(f(arg))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(arg)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.


def bench_dibr_opt(iters):
    """Config 1: one Adam-style silhouette-loss step at 256^2."""
    import jax
    import jax.numpy as jnp
    import kaolin_tpu as kal
    from __graft_entry__ import _scene

    H = W = 256
    verts, faces, cam_rot, cam_trans, cam_proj = _scene(1, 3, jnp.float32)
    target = jnp.zeros((1, H, W), jnp.float32)

    def step(v):
        def loss_fn(v):
            fvc, fvi, fn = kal.render.mesh.prepare_vertices(
                v, faces, cam_proj, camera_rot=cam_rot,
                camera_trans=cam_trans)
            ff = jnp.ones(fvc.shape[:3] + (1,))
            _, sm, _ = kal.render.mesh.dibr_rasterization(
                H, W, fvc[..., 2], fvi, ff, fn[..., 2])
            return kal.metrics.render.mask_iou(sm, target)
        _, g = jax.value_and_grad(loss_fn)(v)
        return v - 1e-3 * g

    return {'metric': 'dibr_256_silhouette_step', 'unit': 'ms/step',
            'value': round(_time(step, verts, iters), 3)}


def bench_dibr_textured(iters):
    """Config 2 AT SPEC (BASELINE.json: "ShapeNet car batch=8, texture +
    Lambertian, pose/camera gradients"): subdiv-5 icosphere — 20,480
    faces, ShapeNet-car scale — batch 8 distinct poses, 512^2, bilinear
    256^2 texture + normal-z Lambertian shading. Gradients flow to
    vertices AND texture AND the camera (6-DoF ``CameraExtrinsics``
    params — the reference's camera-optimization representation,
    ``extrinsics_backends.py:205``)."""
    import math

    import jax
    import jax.numpy as jnp
    import kaolin_tpu as kal
    from kaolin_tpu.render.camera import CameraExtrinsics
    from kaolin_tpu.ops.mesh import index_vertices_by_faces, face_normals
    from __graft_entry__ import _icosphere

    B, H, W = 8, 512, 512
    verts_np, faces_np = _icosphere(5)            # 10,242 v / 20,480 f
    faces = jnp.asarray(faces_np)
    verts = jnp.tile(jnp.asarray(verts_np)[None], (B, 1, 1))
    angles = np.linspace(0., 2 * np.pi, B, endpoint=False)
    eye = jnp.asarray(np.stack([3 * np.sin(angles),
                                0.5 * np.ones_like(angles),
                                3 * np.cos(angles)], -1), jnp.float32)
    ext0 = CameraExtrinsics.from_lookat(
        eye, jnp.zeros((B, 3)), jnp.tile(jnp.asarray([[0., 1., 0.]]),
                                         (B, 1)),
        backend='matrix_6dof_rotation')
    cam_params = ext0.parameters()                # (B, 9) 6-DoF + trans
    cam_proj = kal.render.camera.generate_perspective_projection(
        math.pi / 4.)
    rng = np.random.default_rng(0)
    texture = jnp.asarray(rng.random((B, 3, 256, 256)), jnp.float32)
    nv = verts.shape[1]
    uvs = jnp.asarray(rng.random((B, nv, 2)), jnp.float32)  # [0, 1]
    face_uvs = uvs[:, faces]                      # (B, F, 3, 2)
    target = jnp.zeros((B, H, W, 3), jnp.float32)

    def step(arg):
        def loss_fn(v, tex, camp):
            ext = CameraExtrinsics(camp, backend='matrix_6dof_rotation')
            vc = ext.transform(v)
            vi = kal.render.camera.perspective_camera(vc, cam_proj)
            fvc = index_vertices_by_faces(vc, faces)
            fvi = index_vertices_by_faces(vi, faces)
            fn = face_normals(fvc, unit=True)
            ff = [face_uvs,
                  jnp.broadcast_to(fn[:, :, None, 2:],
                                   fvc.shape[:3] + (1,))]
            (uv_map, nz_map), _ = kal.render.mesh.rasterize(
                H, W, fvc[..., 2], fvi, ff, fn[..., 2] >= 0)
            img = kal.render.mesh.texture_mapping(uv_map, tex,
                                                  mode='bilinear')
            img = img * jnp.clip(nz_map, 0., 1.)   # Lambertian-ish shade
            return jnp.mean(jnp.abs(img - target))
        _, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(*arg)
        return (arg[0] - 1e-6 * g[0], arg[1] - 1e-6 * g[1],
                arg[2] - 1e-6 * g[2])

    ms = _time(step, (verts, texture, cam_params), iters)
    return {'metric': 'dibr_512_textured_b8_20k', 'unit': 'ms/frame',
            'faces': int(faces_np.shape[0]),
            'value': round(ms / B, 3)}


def bench_face_sweep(iters):
    """Rasterize + soft-mask fwd+bwd face-count scaling: subdiv-3..6
    icospheres (1.3k / 5k / 20k / 80k faces), 512^2, batch 1, vertex
    grads through both kernels (the reference CUDA kernel's shared-mem
    tiling exists exactly for this axis,
    ``rasterization_cuda.cu:88-105``)."""
    import math

    import jax
    import jax.numpy as jnp
    import kaolin_tpu as kal
    from kaolin_tpu.render.camera import (
        generate_rotate_translate_matrices,
        generate_perspective_projection)
    from __graft_entry__ import _icosphere

    H = W = 512
    cam_proj = generate_perspective_projection(math.pi / 4.)
    rows = {}
    for subdiv in (3, 4, 5, 6):
        verts_np, faces_np = _icosphere(subdiv)
        faces = jnp.asarray(faces_np)
        verts = jnp.asarray(verts_np)[None]
        cam_rot, cam_trans = generate_rotate_translate_matrices(
            jnp.asarray([[0., 0.5, 3.]]), jnp.zeros((1, 3)),
            jnp.asarray([[0., 1., 0.]]))
        target = jnp.zeros((1, H, W), jnp.float32)

        def step(v, faces=faces, cam_rot=cam_rot, cam_trans=cam_trans,
                 target=target):
            def loss_fn(v):
                fvc, fvi, fn = kal.render.mesh.prepare_vertices(
                    v, faces, cam_proj, camera_rot=cam_rot,
                    camera_trans=cam_trans)
                ff = jnp.ones(fvc.shape[:3] + (1,))
                feat, sm, _ = kal.render.mesh.dibr_rasterization(
                    H, W, fvc[..., 2], fvi, ff, fn[..., 2])
                return (jnp.mean(jnp.abs(feat))
                        + kal.metrics.render.mask_iou(sm, target))
            _, g = jax.value_and_grad(loss_fn)(v)
            return v - 1e-6 * g

        rows[int(faces_np.shape[0])] = round(_time(step, verts, iters), 3)
    return {'metric': 'rasterize_softmask_512_face_sweep',
            'unit': 'ms/frame', 'value': rows[20480], 'sweep_ms': rows}


def bench_pointcloud(iters):
    """Config 3: chamfer(100k, 100k) + point_to_mesh(100k, 10k faces)."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.metrics.pointcloud import chamfer_distance
    from kaolin_tpu.metrics.trianglemesh import point_to_mesh_distance

    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.random((1, 100_000, 3)), jnp.float32)
    p2 = jnp.asarray(rng.random((1, 100_000, 3)), jnp.float32)
    fv = jnp.asarray(rng.random((1, 10_000, 3, 3)), jnp.float32)

    def step(p):
        c = chamfer_distance(p, p2)
        d, _, _ = point_to_mesh_distance(p, fv)
        return p + 1e-20 * (c[..., None, None] + jnp.mean(d))

    return {'metric': 'chamfer100k_p2m10k', 'unit': 'ms/iter',
            'value': round(_time(step, p1, iters), 3)}


def bench_deftet(iters):
    """Config 4: DefTet sparse render fwd+bwd, 64^2 pixels, 10k faces."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.render.mesh import deftet_sparse_render

    rng = np.random.default_rng(0)
    B, P, F = 1, 64 * 64, 10_000
    ys, xs = np.meshgrid(np.linspace(-1, 1, 64), np.linspace(-1, 1, 64))
    pc = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1)[None],
                     jnp.float32)
    rr = jnp.asarray(np.tile([[-1e10, 0.]], (P, 1))[None], jnp.float32)
    fvz = jnp.asarray(-1. - rng.random((B, F, 3)), jnp.float32)
    fvi = jnp.asarray(rng.uniform(-1, 1, (B, F, 3, 2)), jnp.float32)
    ff = jnp.asarray(rng.random((B, F, 3, 2)), jnp.float32)

    def step(fvi):
        def loss_fn(fvi):
            feat, _ = deftet_sparse_render(pc, rr, fvz, fvi, ff, knum=30)
            return jnp.sum(feat ** 2)
        _, g = jax.value_and_grad(loss_fn)(fvi)
        return fvi - 1e-9 * g

    return {'metric': 'deftet_64x64_10kfaces', 'unit': 'ms/iter',
            'value': round(_time(step, fvi, iters), 3)}


def bench_raytrace(iters):
    """Config 5: SPC raytrace, 256^2 rays, level-8 sphere shell."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points)
    from kaolin_tpu.render.spc import (unbatched_raytrace_fixed,
                                       generate_primary_rays)
    from kaolin_tpu.render.spc.raytrace import (plan_raytrace,
                                                level_offsets_from_octree,
                                                primary_rays_fn)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(200_000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    level = 8
    qpts = quantize_points(jnp.asarray(dirs * 0.7, jnp.float32), level)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    # ray_fn mode: primary rays recompute from the closure — the
    # fastest banded mode (the ARRAY mode's carried-plane kernel is
    # ~1.7x slower: 6 extra compacted fields per level; see BASELINE.md
    # round 5)
    ray_fn = primary_rays_fn(256, 256, jnp.asarray([0., 0., 2.5]),
                             jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                             np.pi / 3)
    o, d = ray_fn(jnp.arange(65536, dtype=jnp.int32))
    offs = level_offsets_from_octree(octree)
    sched, counts = plan_raytrace(octree, ph, exsum, o, d, level,
                                  cap=64 * 65536, level_offsets=offs,
                                  ray_fn=ray_fn, return_counts=True)
    cap = max(max(int(c) for c in sched), 65536)
    # the shipped default: backend='auto' (banded on TPU once a probe
    # schedule exists). Parity-gate against the XLA path once so an
    # undersized schedule can't silently time a truncated traversal.
    ref_n = int(unbatched_raytrace_fixed(
        octree, ph, exsum, o, d, level, cap, cap_schedule=sched,
        ray_fn=ray_fn, level_offsets=offs, backend='xla')[3])
    auto_n = int(unbatched_raytrace_fixed(
        octree, ph, exsum, o, d, level, cap, cap_schedule=counts,
        ray_fn=ray_fn, level_offsets=offs)[3])
    assert auto_n == ref_n, (auto_n, ref_n)

    def step(o):
        _, _, dep, cnt = unbatched_raytrace_fixed(
            octree, ph, exsum, o, d, level, cap, cap_schedule=counts,
            ray_fn=ray_fn, level_offsets=offs)
        return o + 1e-20 * jnp.max(dep)

    import jax as _jax
    from kaolin_tpu.render.spc.raytrace import _banded_viable
    backend = ('banded' if _banded_viable(level, counts, offs, 65536)
               else 'xla')
    return {'metric': 'spc_raytrace_256_L8', 'unit': 'ms/trace',
            'backend_auto': backend,
            'value': round(_time(step, o, iters), 3)}


def main():
    p = argparse.ArgumentParser()
    # 10 iters under-amortizes the tunnel's fixed dispatch+fetch cost
    # (config 1 reads 6.4 ms/step at 10 iters vs 2.2 ms at 32)
    p.add_argument('--iters', type=int, default=32)
    p.add_argument('--only', type=str, default=None,
                   help='comma-separated subset: opt,textured,facesweep,'
                        'pcl,deftet,raytrace')
    args = p.parse_args()
    benches = {
        'opt': bench_dibr_opt,
        'textured': bench_dibr_textured,
        'facesweep': bench_face_sweep,
        'pcl': bench_pointcloud,
        'deftet': bench_deftet,
        'raytrace': bench_raytrace,
    }
    names = args.only.split(',') if args.only else list(benches)
    for name in names:
        try:
            print(json.dumps(benches[name](args.iters)), flush=True)
        except Exception as e:                          # noqa: BLE001
            print(json.dumps({'metric': name, 'error': repr(e)[:200]}),
                  flush=True)


if __name__ == '__main__':
    main()
