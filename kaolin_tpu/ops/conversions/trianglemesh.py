"""Triangle mesh to voxelgrid conversion.

Reference: ``kaolin/ops/conversions/trianglemesh.py:24`` — surface
voxelization: vertices are upsampled (edge subdivision) until every edge
is shorter than the voxel size, then box-tested. Here the subdivision is
replaced by direct area sampling of each face at sub-voxel density (same
surface coverage guarantee, fully vectorized).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .pointcloud import _base_points_to_voxelgrids

__all__ = ['trianglemeshes_to_voxelgrids']


def trianglemeshes_to_voxelgrids(vertices, faces, resolution, origin=None,
                                 scale=None):
    """Converts meshes to surface-occupancy voxelgrids.

    Args:
        vertices: (batch_size, num_vertices, 3).
        faces: (num_faces, 3) int.
        resolution (int).
        origin: optional (batch_size, 3); default per-batch min.
        scale: optional (batch_size,); default max extent.

    Returns:
        (batch_size, resolution, resolution, resolution) float.
    """
    if not isinstance(resolution, int):
        raise TypeError(f"Expected resolution to be int "
                        f"but got {type(resolution)}.")
    if origin is None:
        origin = jnp.min(vertices, axis=1)
    if scale is None:
        scale = jnp.max(jnp.max(vertices, axis=1) - origin, axis=1)
    normalized = (vertices - origin[:, None]) / scale[:, None, None]

    v0 = jnp.take(normalized, faces[:, 0], axis=1)
    v1 = jnp.take(normalized, faces[:, 1], axis=1)
    v2 = jnp.take(normalized, faces[:, 2], axis=1)
    # sample each face on a barycentric lattice fine enough that adjacent
    # samples fall in neighbouring voxels: subdivisions per edge from the
    # longest edge length in voxel units
    e = jnp.maximum(jnp.maximum(jnp.linalg.norm(v1 - v0, axis=-1),
                                jnp.linalg.norm(v2 - v1, axis=-1)),
                    jnp.linalg.norm(v0 - v2, axis=-1))
    n = int(np.ceil(float(jnp.max(e)) * resolution * 2)) + 1
    n = min(max(n, 2), 4 * resolution)
    s = jnp.linspace(0., 1., n)
    u, v = jnp.meshgrid(s, s, indexing='ij')
    keep = (u + v) <= 1.
    u = u[keep]
    v = v[keep]
    w = 1. - u - v
    samples = (v0[:, :, None] * w[None, None, :, None]
               + v1[:, :, None] * u[None, None, :, None]
               + v2[:, :, None] * v[None, None, :, None])
    B = vertices.shape[0]
    return _base_points_to_voxelgrids(samples.reshape(B, -1, 3), resolution)
