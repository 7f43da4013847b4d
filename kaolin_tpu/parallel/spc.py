"""Multi-chip SPC ray tracing: rays sharded over the device mesh.

Config 5 of BASELINE.md: the octree (small: bytes + hierarchy) is
replicated on every device; each device traces its slice of the rays —
zero cross-device traffic in the forward pass (SURVEY §5: the renderer's
"sequence parallelism" is ray sharding). Results stay ray-sharded for
downstream per-ray integration; feature gradients psum over the mesh via
shard_map's transpose when used inside a differentiable pipeline.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..render.spc.raytrace import unbatched_raytrace_fixed, plan_raytrace

__all__ = ['sharded_raytrace', 'plan_sharded_raytrace']


def plan_sharded_raytrace(n_shards, octree, point_hierarchy, exsum,
                          origin, direction, level, cap=None,
                          margin=1.25, ray_fn=None, level_offsets=None,
                          return_counts=False):
    """Per-device ``cap_schedule`` for :func:`sharded_raytrace`.

    Probes each ray shard separately and takes the elementwise max of
    the per-level nugget counts, so per-device buffers scale down with
    the shard count instead of reusing the full-trace schedule (rays
    cluster spatially — the max-shard counts, not counts/n, are the
    safe per-device sizes). Returns (schedule, cap_per_device).
    """
    num_rays = origin.shape[0]
    assert num_rays % n_shards == 0, (num_rays, n_shards)
    per = num_rays // n_shards
    scheds = []
    for s in range(n_shards):
        sl = slice(s * per, (s + 1) * per)
        if ray_fn is None:
            local_fn = None
        else:
            off = jnp.int32(s * per)

            def local_fn(ridx, off=off):
                return ray_fn(ridx + off)
        scheds.append(plan_raytrace(
            octree, point_hierarchy, exsum, origin[sl], direction[sl],
            level, cap=cap, margin=margin, ray_fn=local_fn,
            level_offsets=level_offsets, return_counts=True))
    sched = tuple(max(col) for col in zip(*(s0 for s0, _ in scheds)))
    counts = tuple(max(col) for col in zip(*(c0 for _, c0 in scheds)))
    if return_counts:
        return sched, max(max(sched), per), counts
    return sched, max(max(sched), per)


def sharded_raytrace(mesh, octree, point_hierarchy, exsum, origin,
                     direction, level, cap_per_device, with_exit=False,
                     axis='pix', cap_schedule=None, ray_fn=None,
                     level_offsets=None, backend='auto'):
    """Traces rays sharded along ``axis`` of the device mesh.

    Args:
        mesh: jax.sharding.Mesh (e.g. from
            :func:`kaolin_tpu.parallel.make_mesh`).
        octree / point_hierarchy / exsum: SPC structure (replicated).
        origin, direction: (num_rays, 3); num_rays must divide by the
            axis size.
        level (int): target octree level.
        cap_per_device (int): nugget capacity per device shard.
        axis (str): mesh axis to shard rays over.
        cap_schedule: optional per-level caps (see
            :func:`kaolin_tpu.render.spc.raytrace.plan_raytrace`).
        ray_fn: optional GLOBAL-index ray closure (see
            :func:`kaolin_tpu.render.spc.raytrace.primary_rays_fn`);
            each shard offsets its local ray indices by
            ``axis_index * rays_per_device`` before calling it.
        level_offsets / backend: forwarded to
            :func:`unbatched_raytrace_fixed` — 'banded' runs the
            cursor-compaction Pallas kernel inside each shard (needs
            ``cap_schedule`` as per-device raw counts and
            ``level_offsets``); 'auto' applies the measured gate per
            shard.

    Returns:
        (ray_index, point_index, depth, count): per-device results
        concatenated along the ray axis; ``ray_index`` values are LOCAL
        to each shard of rays (offset by shard * rays_per_device to
        globalize), count is (num_devices,).
    """
    n = mesh.shape[axis]
    assert origin.shape[0] % n == 0, (origin.shape, n)
    tracer = _sharded_tracer(mesh, level, int(cap_per_device),
                             bool(with_exit), axis, cap_schedule, ray_fn,
                             origin.shape[0] // n, level_offsets, backend)
    return tracer(octree, point_hierarchy, exsum, origin, direction)


@functools.lru_cache(maxsize=64)
def _sharded_tracer(mesh, level, cap_per_device, with_exit, axis,
                    cap_schedule, ray_fn, rays_per_device,
                    level_offsets=None, backend='auto'):
    """Builds (and caches) the jitted shard_map tracer for one config.

    ``ray_fn`` is part of the jit cache key by identity; memoizing the
    whole jitted closure here keeps repeated eager ``sharded_raytrace``
    calls from re-tracing ``unbatched_raytrace_fixed`` through a fresh
    per-call wrapper closure.
    """
    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(None, None, None, P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)))
    def inner(octree_, ph_, exsum_, o_, d_):
        if ray_fn is None:
            local_fn = None
        else:
            off = (jax.lax.axis_index(axis).astype(jnp.int32)
                   * rays_per_device)

            def local_fn(ridx):
                return ray_fn(ridx + off)
        ridx, pidx, depth, count = unbatched_raytrace_fixed(
            octree_, ph_, exsum_, o_, d_, level, cap_per_device,
            with_exit, cap_schedule=cap_schedule, ray_fn=local_fn,
            level_offsets=level_offsets, backend=backend)
        return ridx, pidx, depth, count[None]

    return jax.jit(inner)
