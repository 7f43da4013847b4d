"""Multi-device scaling benchmark: DIB-R rendering or SPC raytracing
sharded over the ('data', 'pix') mesh.

On real multi-chip hardware this measures Mpixels/s (or Mrays/s) at
1..N chips and the scaling efficiency (BASELINE.md target: >= 85%).
Without multiple real chips it runs on N virtual CPU devices (set by
--devices), which validates the sharded path end-to-end and reports
*relative* scaling — virtual-device numbers share one physical CPU, so
efficiency there only checks that the collectives/partitioning add no
pathological overhead.

Prints one JSON line per device count:
{"devices": N, "mpixels_per_s": X, "efficiency_vs_1": Y}
(raytrace workload reports "mrays_per_s" instead).
"""

import argparse
import json
import math
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--devices', type=int, default=8,
                   help='virtual device count when no multi-chip TPU')
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--iters', type=int, default=5)
    p.add_argument('--force-cpu', action='store_true', default=None,
                   help='use virtual CPU devices even if a TPU is present')
    p.add_argument('--workload', choices=('dibr', 'raytrace'),
                   default='dibr',
                   help='dibr: sharded DIB-R render+grad (Mpixels/s); '
                        'raytrace: sharded SPC trace (Mrays/s)')
    p.add_argument('--level', type=int, default=6,
                   help='octree level for --workload raytrace')
    p.add_argument('--points', type=int, default=100000,
                   help='surface points for --workload raytrace')
    p.add_argument('--rt-backend', choices=('auto', 'xla', 'banded'),
                   default='auto',
                   help='raytrace backend inside each shard (banded = '
                        'the cursor-compaction Pallas kernel under '
                        'shard_map)')
    p.add_argument('--json-out', type=str, default=None,
                   help='append result records to this JSON-lines file')
    p.add_argument('--rast-backend', default=None,
                   choices=('auto', 'xla', 'pallas'),
                   help="rasterize/soft-mask backend for the dibr "
                        "workload (default: 'xla' on virtual CPU "
                        "devices, 'auto' on TPU — 'auto' exercises the "
                        "production Pallas-kernels-under-shard_map path)")
    p.add_argument('--tpu', action='store_true',
                   help='run on the real TPU device(s) instead of '
                        'virtual CPU devices (single-process)')
    p.add_argument('--multihost', action='store_true',
                   help='initialize the JAX multi-process runtime '
                        '(env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, '
                        'JAX_PROCESS_ID) and bench over the global mesh; '
                        'works single-process as a no-op')
    args = p.parse_args()

    if args.multihost or args.tpu:
        args.force_cpu = False

    # env must be set BEFORE jax initializes
    if args.force_cpu or (args.force_cpu is None and not args.multihost
                          and not args.tpu):
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count={args.devices}')
    import jax
    if args.multihost:
        from kaolin_tpu.parallel import init_distributed
        proc_id, proc_count = init_distributed()
        print(f'# multihost: process {proc_id}/{proc_count}, '
              f'{jax.device_count()} global devices', file=sys.stderr)
    elif args.force_cpu or (args.force_cpu is None and not args.tpu):
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    import numpy as np
    import kaolin_tpu as kal
    from kaolin_tpu.parallel import make_mesh

    n_total = jax.device_count()
    on_cpu = jax.default_backend() == 'cpu'
    H = W = args.res
    results = []
    base = None
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    if args.multihost and jax.process_count() > 1:
        # Global mesh only: per-count subsets would split processes
        # unevenly. data rides DCN (across hosts), pix rides ICI.
        counts = [n_total]

    bench_one = (_bench_raytrace if args.workload == 'raytrace'
                 else _bench_dibr)
    unit = ('mrays_per_s' if args.workload == 'raytrace'
            else 'mpixels_per_s')
    for n in counts:
        if args.multihost and jax.process_count() > 1:
            mesh = make_mesh()
        else:
            mesh = make_mesh(data=1, pix=n, devices=jax.devices()[:n])
        rate = bench_one(mesh, args, jax, jnp, np, kal)
        if base is None:
            base = rate
        rec = {'devices': n, 'workload': args.workload,
               unit: round(rate, 3)}
        if args.workload == 'raytrace':
            rec.update(backend=args.rt_backend, res=args.res,
                       level=args.level)
        if on_cpu:
            # virtual devices time-share one host CPU: per-chip
            # efficiency is meaningless; report total throughput vs the
            # 1-device run — a partitioning/collective overhead check
            # (~1.0 or above = the sharded program adds no overhead)
            rec['relative_throughput'] = round(rate / base, 3)
            rec['note'] = 'virtual CPU devices (overhead check only)'
        else:
            rec['efficiency_vs_1'] = round(rate / (base * n), 3)
        results.append(rec)
        if jax.process_index() == 0:
            print(json.dumps(rec))
            if args.json_out:
                with open(args.json_out, 'a') as f:
                    f.write(json.dumps(rec) + '\n')
    return results


def _bench_dibr(mesh, args, jax, jnp, np, kal):
    """Sharded DIB-R render+grad step; returns Mpixels/s."""
    from kaolin_tpu.parallel import sharded_dibr_rasterization
    from __graft_entry__ import _scene
    H = W = args.res
    verts, faces, cam_rot, cam_trans, cam_proj = _scene(1, 2, jnp.float32)

    @jax.jit
    def step(vertices):
        def body(c, _):
            def loss_fn(v):
                fvc, fvi, fn = kal.render.mesh.prepare_vertices(
                    v, faces, cam_proj, camera_rot=cam_rot,
                    camera_trans=cam_trans)
                ff = jnp.ones(fvc.shape[:3] + (1,))
                backend = args.rast_backend or (
                    'xla' if jax.default_backend() == 'cpu' else 'auto')
                feat, mask, _ = sharded_dibr_rasterization(
                    mesh, H, W, fvc[..., 2], fvi, ff, fn[..., 2],
                    rast_backend=backend, mask_backend=backend)
                return jnp.sum(feat ** 2) + jnp.sum(mask)
            l, g = jax.value_and_grad(loss_fn)(c)
            return c - 1e-9 * g, l
        v, ls = jax.lax.scan(body, vertices, None, length=args.iters)
        return ls[-1], jnp.sum(v)

    out = step(verts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = step(verts)
    _ = float(out[0]) + float(out[1])
    dt = (time.perf_counter() - t0) / args.iters
    return H * W / dt / 1e6


def _bench_raytrace(mesh, args, jax, jnp, np, kal):
    """Sharded SPC trace over the 'pix' axis; returns Mrays/s."""
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points)
    from kaolin_tpu.render.spc import primary_rays_fn
    from kaolin_tpu.parallel import sharded_raytrace
    from kaolin_tpu.parallel.spc import plan_sharded_raytrace

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(args.points, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    qpts = quantize_points(jnp.asarray(dirs * 0.7, jnp.float32),
                           args.level)
    octree = unbatched_points_to_octree(qpts, args.level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)

    ray_fn = primary_rays_fn(
        args.res, args.res, jnp.asarray([0., 0., 2.5]), jnp.zeros(3),
        jnp.asarray([0., 1., 0.]), jnp.pi / 3)
    num_rays = args.res * args.res
    o, d = ray_fn(jnp.arange(num_rays, dtype=jnp.int32))
    n = mesh.shape['pix']
    from kaolin_tpu.render.spc.raytrace import level_offsets_from_octree
    offs = level_offsets_from_octree(octree)
    plan_cap = min(64 * num_rays, max(4 * num_rays, 4_194_304))
    sched, cap, counts = plan_sharded_raytrace(
        n, octree, ph, exsum, o, d, args.level, cap=plan_cap,
        ray_fn=ray_fn, level_offsets=offs, return_counts=True)
    if args.rt_backend == 'banded':
        sched_used, backend = counts, 'banded'
    else:
        sched_used, backend = sched, args.rt_backend

    @jax.jit
    def run(o, d):
        def step(c, _):
            ridx, pidx, depth, count = sharded_raytrace(
                mesh, octree, ph, exsum, o + c * 1e-12, d, args.level,
                cap, cap_schedule=sched_used, ray_fn=ray_fn,
                level_offsets=offs, backend=backend)
            return c + (count.sum() & 1).astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=args.iters)
        return c

    out = run(o, d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    float(run(o, d))
    dt = (time.perf_counter() - t0) / args.iters
    return num_rays / dt / 1e6


if __name__ == '__main__':
    main()
