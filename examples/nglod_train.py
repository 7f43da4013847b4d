"""nglod-style neural SDF on an SPC octree: build the octree from surface
samples, fit multi-level corner features with trilinear interpolation,
render with the SPC raytracer + sphere tracing against the fitted SDF.

Reference workload: BASELINE.md config 5 / the nglod use case called out
in the reference README (``README.md:39``).

Run: ``python -m examples.nglod_train [--level L] [--steps N]``.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaolin_tpu.ops.spc import (quantize_points, unbatched_points_to_octree,
                                scan_octrees, generate_points,
                                unbatched_query, unbatched_make_dual,
                                unbatched_make_trinkets,
                                unbatched_interpolate_trilinear)
from kaolin_tpu.render.spc import (unbatched_raytrace_fixed,
                                   generate_primary_rays,
                                   mark_pack_boundaries)
from kaolin_tpu.render.spc.raytrace import plan_raytrace, cumsum


def sdf_gt(p):
    """Ground-truth SDF: a sphere of radius 0.6."""
    return jnp.linalg.norm(p, axis=-1) - 0.6


def main(level=6, steps=300, render_res=128):
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(20000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    surf = dirs * 0.6

    # SPC structure (host preprocessing)
    octree = unbatched_points_to_octree(
        quantize_points(jnp.asarray(surf, jnp.float32), level), level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    phd, pyr_dual = unbatched_make_dual(ph, pyramids[0])
    trinkets, _ = unbatched_make_trinkets(ph, pyramids[0], phd, pyr_dual)
    n_dual = np.asarray(phd).shape[0]
    print(f"octree: level {level}, {np.asarray(ph).shape[0]} nodes, "
          f"{n_dual} dual corners")

    # training points near the surface
    train = surf + rng.normal(0, 0.5 / 2 ** level, surf.shape)
    coords = jnp.asarray(train, jnp.float32)
    pidx = unbatched_query(octree, exsum, coords, level)
    target = sdf_gt(coords)
    feats0 = jnp.zeros((n_dual, 1), jnp.float32)

    opt = optax.adam(5e-3)
    state = opt.init(feats0)

    @jax.jit
    def fit(feats, state):
        def body(c, _):
            f, s = c

            def loss_fn(f):
                pred = unbatched_interpolate_trilinear(
                    coords[:, None, :], pidx, ph, trinkets, f,
                    level)[:, 0, 0]
                valid = pidx >= 0
                return jnp.sum(jnp.where(valid, (pred - target) ** 2, 0.)
                               ) / jnp.sum(valid)

            l, g = jax.value_and_grad(loss_fn)(f)
            u, s = opt.update(g, s)
            return (optax.apply_updates(f, u), s), l

        (f, s), ls = jax.lax.scan(body, (feats, state), None, length=steps)
        return f, ls

    t0 = time.perf_counter()
    feats, losses = fit(feats0, state)
    losses = np.asarray(losses)
    print(f"fit {steps} steps in {time.perf_counter() - t0:.1f}s; "
          f"loss {losses[0]:.5f} -> {losses[-1]:.2e}")

    # render: raytrace to voxel hits, refine depth by sphere tracing the
    # fitted SDF inside each hit interval
    H = W = render_res
    o, d = generate_primary_rays(H, W, jnp.asarray([0., 0., 2.0]),
                                 jnp.zeros(3), jnp.asarray([0., 1., 0.]),
                                 jnp.pi / 3)
    cap = 16 * H * W
    sched = plan_raytrace(octree, ph, exsum, o, d, level, cap=cap)

    @jax.jit
    def render(feats):
        ridx, pidx_r, depth, count = unbatched_raytrace_fixed(
            octree, ph, exsum, o, d, level, cap, with_exit=True,
            cap_schedule=sched)
        valid = ridx >= 0
        seg = jnp.maximum(ridx, 0)
        tmid = 0.5 * (depth[:, 0] + depth[:, 1])
        pts = jnp.take(o, seg, axis=0) + tmid[:, None] \
            * jnp.take(d, seg, axis=0)
        sdf_vals = unbatched_interpolate_trilinear(
            pts[:, None, :], pidx_r, ph, trinkets, feats, level)[:, 0, 0]
        # first voxel whose midpoint SDF <= half voxel size wins
        hit = valid & (sdf_vals <= 1.0 / 2 ** level)
        first = mark_pack_boundaries(seg) & valid
        # pick the first hit per ray: mask then min-depth via segment min
        big = jnp.where(hit, tmid, jnp.inf)
        depth_img = jax.ops.segment_min(big, seg, num_segments=H * W)
        return depth_img.reshape(H, W)

    depth_img = np.asarray(render(feats))
    covered = np.isfinite(depth_img)
    center = depth_img[H // 2, W // 2]
    print(f"render: coverage {covered.mean():.3f}, center depth "
          f"{center:.3f} (analytic {2.0 - 0.6:.3f})")
    return losses, depth_img


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--level', type=int, default=6)
    p.add_argument('--steps', type=int, default=300)
    args = p.parse_args()
    main(level=args.level, steps=args.steps)
