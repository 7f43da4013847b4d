"""Multi-chip sharded point metrics: queries sharded, targets replicated.

New TPU-native component (SURVEY §2.3): the reference's metrics are
single-GPU brute force. Here the query points shard across every device
of the mesh (both axes flattened — metric workloads have no image
plane), the target cloud / face table is replicated, and each device
runs the same Pallas/XLA kernel on its slice. Forward needs zero
collectives; gradients to the replicated operand are partial sums that
``shard_map``'s transpose psum-reduces over ICI automatically.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..metrics.pointcloud import sided_distance, chamfer_distance
from ..metrics.trianglemesh import point_to_mesh_distance

__all__ = ['sharded_sided_distance', 'sharded_chamfer_distance',
           'sharded_point_to_mesh_distance']


def _flat_axes(mesh):
    return tuple(mesh.axis_names)


def sharded_sided_distance(mesh, p1, p2, backend='auto'):
    """:func:`sided_distance` with ``p1`` sharded over every mesh axis
    and ``p2`` replicated. Returns (dist (B, N1), idx (B, N1)),
    sharded like ``p1``. Differentiable (grads to ``p2`` psum over the
    mesh)."""
    axes = _flat_axes(mesh)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(None, axes), P()),
                       out_specs=(P(None, axes), P(None, axes)),
                       check_vma=False)
    def inner(p1_local, p2_full):
        return sided_distance(p1_local, p2_full, backend=backend)

    return inner(p1, p2)


def sharded_chamfer_distance(mesh, p1, p2, w1=1., w2=1., squared=True,
                             backend='auto'):
    """:func:`chamfer_distance` over the mesh: each direction shards its
    query side and replicates the other; the two partial means combine
    exactly like the single-device formula."""
    axes = _flat_axes(mesh)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(None, axes), P()),
                       out_specs=P(None, axes),
                       check_vma=False)
    def d12(p1_local, p2_full):
        return sided_distance(p1_local, p2_full, backend=backend)[0]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(None, axes)),
                       out_specs=P(None, axes),
                       check_vma=False)
    def d21(p1_full, p2_local):
        return sided_distance(p2_local, p1_full, backend=backend)[0]

    sdist1 = d12(p1, p2)
    sdist2 = d21(p1, p2)
    if not squared:
        sdist1 = jnp.sqrt(sdist1)
        sdist2 = jnp.sqrt(sdist2)
    return w1 * jnp.mean(sdist1, axis=-1) + w2 * jnp.mean(sdist2, axis=-1)


def sharded_point_to_mesh_distance(mesh, pointclouds, face_vertices,
                                   backend='auto'):
    """:func:`point_to_mesh_distance` with points sharded over every
    mesh axis and the face table replicated."""
    axes = _flat_axes(mesh)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(None, axes), P()),
                       out_specs=(P(None, axes),) * 3,
                       check_vma=False)
    def inner(pts_local, fv_full):
        return point_to_mesh_distance(pts_local, fv_full, backend=backend)

    return inner(pointclouds, face_vertices)
