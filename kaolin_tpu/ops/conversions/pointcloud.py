"""Pointcloud conversions: to voxelgrids and to SPC.

Reference: ``kaolin/ops/conversions/pointcloud.py:77-197``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..spc.points import quantize_points, points_to_morton, morton_to_points
from ..spc.points import unbatched_points_to_octree
from ..spc.points import _morton_np
from ...rep.spc import Spc

__all__ = ['pointclouds_to_voxelgrids', 'unbatched_pointcloud_to_spc']


def _base_points_to_voxelgrids(points, resolution):
    """Scatters normalized [0, 1] points into binary voxelgrids.

    Reference: ``kaolin/ops/conversions/pointcloud.py:22`` (rounds to the
    (resolution-1) grid; out-of-range points are discarded).
    """
    B = points.shape[0]
    idx = jnp.round(points * (resolution - 1)).astype(jnp.int32)
    in_range = jnp.all((idx >= 0) & (idx <= resolution - 1), axis=-1)
    flat = (idx[..., 0] * resolution + idx[..., 1]) * resolution \
        + idx[..., 2]
    flat = jnp.where(in_range, flat, resolution ** 3)

    def one(f):
        grid = jnp.zeros((resolution ** 3 + 1,), jnp.float32)
        grid = grid.at[f].set(1.)
        return grid[:-1].reshape(resolution, resolution, resolution)

    return jax.vmap(one)(flat)


def pointclouds_to_voxelgrids(pointclouds, resolution, origin=None,
                              scale=None):
    """Voxelizes batched pointclouds into binary occupancy grids.

    Reference: ``kaolin/ops/conversions/pointcloud.py:77``.

    Args:
        pointclouds: (batch_size, num_points, 3).
        resolution (int).
        origin: optional (batch_size, 3); default per-batch min.
        scale: optional (batch_size,); default max extent.

    Returns:
        (batch_size, resolution, resolution, resolution) float.
    
    Example:
        >>> import jax.numpy as jnp
        >>> pc = jnp.asarray([[[-1., -1., -1.], [1., 1., 1.]]])
        >>> vg = pointclouds_to_voxelgrids(pc, 2)
        >>> print(vg[0, 0, 0, 0], vg[0, 1, 1, 1])
        1.0 1.0
    """
    if not isinstance(resolution, int):
        raise TypeError(f"Expected resolution to be int "
                        f"but got {type(resolution)}.")
    if origin is None:
        origin = jnp.min(pointclouds, axis=1)
    if scale is None:
        scale = jnp.max(jnp.max(pointclouds, axis=1) - origin, axis=1)
    normalized = (pointclouds - origin[:, None]) / scale[:, None, None]
    return _base_points_to_voxelgrids(normalized, resolution)


def unbatched_pointcloud_to_spc(pointcloud, level, features=None):
    """Converts an unbatched [-1, 1] pointcloud to an SPC (plus averaged
    per-cell features).

    Reference: ``kaolin/ops/conversions/pointcloud.py:143``.

    Returns:
        kaolin_tpu.rep.Spc with ``features`` set (morton-ordered per
        occupied leaf cell, mean over points in the cell; integer
        features are rounded).
    """
    qpts = np.asarray(quantize_points(pointcloud, level))
    morton_all = _morton_np(qpts.reshape(-1, 3))
    unique_m, unique_keys, unique_counts = np.unique(
        morton_all, return_inverse=True, return_counts=True)
    octree = unbatched_points_to_octree(qpts, level, sorted=False)
    lengths = np.array([len(np.asarray(octree))], dtype=np.int32)

    feat = None
    if features is not None:
        is_fp = jnp.issubdtype(features.dtype, jnp.floating)
        acc = jnp.zeros((unique_m.shape[0], features.shape[1]),
                        jnp.float64)
        acc = acc.at[jnp.asarray(unique_keys)].add(
            features.astype(jnp.float64))
        feat = acc / jnp.asarray(unique_counts, jnp.float64)[:, None]
        if not is_fp:
            feat = jnp.round(feat)
        feat = feat.astype(features.dtype)
    return Spc(octrees=octree, lengths=lengths, features=feat)
