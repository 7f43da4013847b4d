"""SPC raytrace benchmark (BASELINE.json config 5, single chip).

Traces camera rays against a sphere-surface SPC and reports ms per
trace. Timing follows the repo convention (CLAUDE.md): iterations are
chained inside one jit via ``lax.scan`` (the ray origin is nudged by a
result-dependent epsilon so XLA cannot collapse the chain) and the best
of several repeats is taken, because per-call host timing through the
shared axon TPU tunnel is meaningless.

Usage: python bench_raytrace.py [--res 256] [--level 8] [--iters 8]
Prints one JSON line: {"metric": "spc_raytrace_<res>_L<level>", ...}.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--level', type=int, default=8)
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--reps', type=int, default=4)
    p.add_argument('--points', type=int, default=200000)
    p.add_argument('--backend', choices=('xla', 'banded', 'banded_sort'),
                   default='xla',
                   help="'banded' = the cursor-compaction Pallas kernel "
                        "through the PUBLIC API (unbatched_raytrace_fixed"
                        "(backend='banded')); 'banded_sort' = the older "
                        "sort-per-level kernel, called directly")
    p.add_argument('--ray-mode', choices=('ray_fn', 'arrays', 'cols'),
                   default='ray_fn',
                   help="banded kernels: 'ray_fn' = per-level XLA ray "
                        "recompute (bit-exact vs the XLA path); "
                        "'arrays' = the reference-parity origin/"
                        "direction-array entrypoint (carried-plane "
                        "mode, also bit-exact); 'cols' = in-kernel "
                        "recompute (~1 ulp ray drift; banded_sort only)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points)
    from kaolin_tpu.render.spc import (unbatched_raytrace_fixed,
                                       primary_rays_fn)
    from kaolin_tpu.render.spc.raytrace import (plan_raytrace,
                                                level_offsets_from_octree)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(args.points, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    surf = dirs * 0.7
    qpts = quantize_points(jnp.asarray(surf, jnp.float32), args.level)
    octree = unbatched_points_to_octree(qpts, args.level)
    lengths = np.array([len(np.asarray(octree))])
    max_level, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)

    ray_fn = primary_rays_fn(
        args.res, args.res, jnp.asarray([0., 0., 2.5]), jnp.zeros(3),
        jnp.asarray([0., 1., 0.]), jnp.pi / 3)
    num_rays = args.res * args.res
    o, d = ray_fn(jnp.arange(num_rays, dtype=jnp.int32))

    offs = level_offsets_from_octree(octree)
    # worst-case probe caps of 64x rays OOM HBM at 1024^2 (67M nuggets
    # x 8 candidates x 11 sort operands); 4x rays (floor 4M) covers
    # every measured level count with plenty of headroom
    plan_cap = min(64 * num_rays, max(4 * num_rays, 4_194_304))
    sched, raw_counts = plan_raytrace(octree, ph, exsum, o, d, args.level,
                                      cap=plan_cap, ray_fn=ray_fn,
                                      level_offsets=offs,
                                      return_counts=True)
    cap = max(max(int(c) for c in sched), num_rays)
    print(f'# octree nodes={int(lengths[0])} schedule={sched} '
          f'level_offsets={offs}', flush=True)
    ref_nuggets = int(np.asarray(unbatched_raytrace_fixed(
        octree, ph, exsum, o, d, args.level, cap, cap_schedule=sched,
        ray_fn=ray_fn, level_offsets=offs, backend='xla')[3]))

    if args.backend == 'banded':
        # the PUBLIC API path: banded backend takes the RAW probe counts
        # as its cap_schedule (it applies margin_dense internally).
        # 'arrays' (and legacy 'cols' here) = the reference-parity
        # origin/direction signature -> carried-plane kernel mode
        bkw = (dict(ray_fn=ray_fn) if args.ray_mode == 'ray_fn'
               else {})

        # row probe: measure the kernel's actual per-level output rows
        # once, then re-trace with tight raw capacities (the default
        # raw_factor=4 headroom otherwise inflates sort inputs and the
        # per-level masking/plane passes ~4x)
        from kaolin_tpu.kernels.spc_traverse import (build_node_table_t,
                                                     traverse_banded_cc)
        tblp = build_node_table_t(octree, exsum, ph)
        pkw = dict(ray_fn=ray_fn) if 'ray_fn' in bkw else dict(
            origin=o, direction=d)
        probe = traverse_banded_cc(
            tblp, num_rays, args.level, raw_counts, raw_factor=6,
            level_offsets=tuple(offs), return_rows=True, **pkw)
        assert int(np.asarray(probe[4])) == 0, 'row-probe overflow'
        rrows = tuple(
            max(32, -(-int(r) * 23 // (20 * 32)) * 32)   # x1.15
            for r in np.asarray(probe[5])[:, 0])
        print(f'# banded raw_rows={rrows}', flush=True)

        # correctness gate before timing: no overflow (count <= cap)
        # and nugget-count parity with the XLA path — an undersized
        # schedule would otherwise silently time a truncated traversal
        _, _, _, bcount = (np.asarray(v) for v in unbatched_raytrace_fixed(
            octree, ph, exsum, o, d, args.level, cap,
            cap_schedule=raw_counts, level_offsets=offs,
            backend='banded', banded_raw_rows=rrows, **bkw))
        assert int(bcount) == ref_nuggets, (int(bcount), ref_nuggets)

        @jax.jit
        def run(o, d):
            def step(c, _):
                ridx, pidx, depth, count = unbatched_raytrace_fixed(
                    octree, ph, exsum, o + c * 1e-12, d, args.level, cap,
                    cap_schedule=raw_counts, level_offsets=offs,
                    backend='banded', banded_raw_rows=rrows, **bkw)
                return c + (count & 1).astype(jnp.float32) * 1e-6, None
            c, _ = jax.lax.scan(step, jnp.float32(0), None,
                                length=args.iters)
            return c
    elif args.backend == 'banded_sort':
        from kaolin_tpu.render.spc.raytrace import primary_rays_fn_cols
        from kaolin_tpu.kernels.spc_traverse import (
            build_node_table_t, traverse_banded, schedule_from_counts)
        bsched = schedule_from_counts(raw_counts)
        tbl = build_node_table_t(octree, exsum)
        if args.ray_mode == 'cols':
            bkw = dict(ray_fn_cols=primary_rays_fn_cols(
                args.res, args.res, jnp.asarray([0., 0., 2.5]),
                jnp.zeros(3), jnp.asarray([0., 1., 0.]), jnp.pi / 3))
        else:
            bkw = dict(ray_fn=ray_fn)
        _, _, _, bcount, boflow = (
            np.asarray(v) for v in traverse_banded(
                tbl, num_rays, args.level, bsched, **bkw))
        assert int(boflow) == 0, f'banded schedule overflow: {int(boflow)}'
        assert int(bcount) == ref_nuggets, (int(bcount), ref_nuggets)

        @jax.jit
        def run(o, d):
            def step(c, _):
                r_, p_, dep, count, ov = traverse_banded(
                    tbl + c * 0, num_rays, args.level, bsched, **bkw)
                return c + (count & 1).astype(jnp.float32) * 1e-6, None
            c, _ = jax.lax.scan(step, jnp.float32(0), None,
                                length=args.iters)
            return c
    else:
        @jax.jit
        def run(o, d):
            def step(c, _):
                # level-0 origin nudge keeps the scan chain data-dependent
                ridx, pidx, depth, count = unbatched_raytrace_fixed(
                    octree, ph, exsum, o + c * 1e-12, d, args.level, cap,
                    cap_schedule=sched, ray_fn=ray_fn, level_offsets=offs,
                    backend='xla')
                return c + (count & 1).astype(jnp.float32) * 1e-6, None
            c, _ = jax.lax.scan(step, jnp.float32(0), None,
                                length=args.iters)
            return c

    np.asarray(run(o, d))  # compile + warm
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(run(o, d))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    ms = best * 1e3
    nuggets = ref_nuggets
    print(json.dumps({
        'metric': f'spc_raytrace_{args.res}x{args.res}_L{args.level}',
        'backend': args.backend,
        'value': round(ms, 3), 'unit': 'ms/trace',
        'nuggets': nuggets,
        'mrays_per_s': round(num_rays / best / 1e6, 2),
    }))


if __name__ == '__main__':
    main()
