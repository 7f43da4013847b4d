"""Mesh to Structured Point Cloud (octree) conversion.

Reference: ``kaolin/csrc/ops/conversions/mesh_to_spc/mesh_to_spc_cuda.cu``
(conservative triangle voxelization + morton sort + bottom-up octree
build). Here the voxel fragments come from barycentric supersampling of
each face at sub-voxel density (2 samples per voxel edge), then the
standard morton-unique octree build — covers every voxel the surface
passes through at the sampling density; razor-thin corner clips below
half-voxel scale may be missed (documented deviation from the exact
edge-test rasterizer).
"""

import numpy as np
import jax.numpy as jnp

from ..spc.points import quantize_points, unbatched_points_to_octree

__all__ = ['unbatched_mesh_to_spc', 'mesh_to_spc']


def _surface_samples(vertices, faces, level, samples_per_voxel=2.):
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces)
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    res = 2 ** level
    # per-face subdivisions from the longest edge, in voxel units
    e = np.maximum(np.maximum(np.linalg.norm(v1 - v0, axis=-1),
                              np.linalg.norm(v2 - v1, axis=-1)),
                   np.linalg.norm(v0 - v2, axis=-1))
    n = int(np.ceil(e.max() * res / 2. * samples_per_voxel)) + 1
    n = min(max(n, 2), 8 * res)
    s = np.linspace(0., 1., n)
    u, w = np.meshgrid(s, s, indexing='ij')
    keep = (u + w) <= 1.
    u, w = u[keep], w[keep]
    b0 = (1. - u - w)[None, :, None]
    pts = v0[:, None] * b0 + v1[:, None] * u[None, :, None] \
        + v2[:, None] * w[None, :, None]
    return pts.reshape(-1, 3)


def unbatched_mesh_to_spc(vertices, faces, level):
    """Voxelizes a [-1, 1] mesh surface into an SPC octree.

    Args:
        vertices: (num_vertices, 3) in [-1, 1].
        faces: (num_faces, 3) int.
        level (int): octree depth.

    Returns:
        jnp uint8 octree byte stream (see
        :func:`kaolin_tpu.ops.spc.scan_octrees`).
    """
    pts = _surface_samples(vertices, faces, level)
    qpts = quantize_points(jnp.asarray(pts), level)
    return unbatched_points_to_octree(qpts, level)


def mesh_to_spc(vertices, faces, level):
    """Batched mesh-to-SPC; returns a :class:`kaolin_tpu.rep.Spc`.

    Args:
        vertices: (batch_size, num_vertices, 3) in [-1, 1].
        faces: (num_faces, 3) int (shared topology).
        level (int): octree depth.
    """
    from ...rep.spc import Spc
    octrees = []
    lengths = []
    for b in range(vertices.shape[0]):
        o = unbatched_mesh_to_spc(vertices[b], faces, level)
        octrees.append(o)
        lengths.append(len(np.asarray(o)))
    return Spc(jnp.concatenate(octrees), np.asarray(lengths, np.int32))
