"""SG reduced inner product benchmark (verdict r4 #7).

Measures ``unbatched_reduced_sg_inner_product`` (the DIB-R++ lighting
hot op; reference ships a fused CUDA kernel with analytic backward,
``unbatched_reduced_sg_inner_product_cuda.cu:29-549``) at production
scale: forward and forward+backward, chained-scan timing per CLAUDE.md.

Usage: python bench_sg.py [--queries 100000] [--lights 512]
Prints one JSON line per direction.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--queries', type=int, default=100_000)
    p.add_argument('--lights', type=int, default=512)
    p.add_argument('--iters', type=int, default=16)
    p.add_argument('--reps', type=int, default=4)
    p.add_argument('--chunk', type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from kaolin_tpu.render.lighting import unbatched_reduced_sg_inner_product

    rng = np.random.default_rng(0)
    K, L = args.queries, args.lights

    def unit(n):
        v = rng.normal(size=(n, 3))
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    i_amp = jnp.asarray(rng.uniform(0.5, 1.5, (K, 3)), jnp.float32)
    i_dir = jnp.asarray(unit(K), jnp.float32)
    i_sharp = jnp.asarray(rng.uniform(1., 8., (K,)), jnp.float32)
    o_amp = jnp.asarray(rng.uniform(0.5, 1.5, (L, 3)), jnp.float32)
    o_dir = jnp.asarray(unit(L), jnp.float32)
    o_sharp = jnp.asarray(rng.uniform(1., 8., (L,)), jnp.float32)

    def fwd(a):
        return jnp.sum(unbatched_reduced_sg_inner_product(
            a, i_dir, i_sharp, o_amp, o_dir, o_sharp, chunk=args.chunk))

    grad_all = jax.grad(
        lambda a, d, s, oa, od, os_: jnp.sum(
            unbatched_reduced_sg_inner_product(a, d, s, oa, od, os_,
                                               chunk=args.chunk)),
        argnums=(0, 1, 2, 3, 4, 5))

    def run_case(name, step):
        f = jax.jit(lambda a: jax.lax.scan(
            lambda c, _: (step(c), None), a, None, length=args.iters)[0])
        jax.block_until_ready(f(i_amp))
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(i_amp))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        ms = best * 1e3
        print(json.dumps({
            'metric': f'sg_reduced_inner_{K}x{L}_{name}',
            'value': round(ms, 3), 'unit': 'ms/iter',
            'pairs_per_s': round(K * L / best / 1e9, 2),
        }), flush=True)

    run_case('fwd', lambda a: a + 1e-20 * fwd(a))
    run_case('fwdbwd', lambda a: a - 1e-20 * grad_all(
        a, i_dir, i_sharp, o_amp, o_dir, o_sharp)[0])


if __name__ == '__main__':
    main()
