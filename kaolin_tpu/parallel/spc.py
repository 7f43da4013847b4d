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
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..render.spc.raytrace import unbatched_raytrace_fixed

__all__ = ['sharded_raytrace']


def sharded_raytrace(mesh, octree, point_hierarchy, exsum, origin,
                     direction, level, cap_per_device, with_exit=False,
                     axis='pix', cap_schedule=None):
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

    Returns:
        (ray_index, point_index, depth, count): per-device results
        concatenated along the ray axis; ``ray_index`` values are LOCAL
        to each shard of rays (offset by shard * rays_per_device to
        globalize), count is (num_devices,).
    """
    n = mesh.shape[axis]
    assert origin.shape[0] % n == 0, (origin.shape, n)

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(None, None, None, P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)))
    def inner(octree_, ph_, exsum_, o_, d_):
        ridx, pidx, depth, count = unbatched_raytrace_fixed(
            octree_, ph_, exsum_, o_, d_, level, cap_per_device,
            with_exit, cap_schedule=cap_schedule)
        return ridx, pidx, depth, count[None]

    return inner(octree, point_hierarchy, exsum, origin, direction)
