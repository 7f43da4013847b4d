"""SPC point / morton / trilinear utilities.

Reference: ``kaolin/ops/spc/points.py:35-351`` (CUDA kernels
``kaolin/csrc/ops/spc/point_utils_cuda.cu``). Morton layout: bits
interleaved as ``x << 2 | y << 1 | z`` per level (z least significant),
matching ``spc_math.h``. Octree *construction* runs on host numpy (scene
preprocessing, data-dependent shapes); queries and interpolation are
jittable XLA.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'quantize_points',
    'unbatched_points_to_octree',
    'points_to_morton',
    'morton_to_points',
    'points_to_corners',
    'unbatched_interpolate_trilinear',
    'coords_to_trilinear_coeffs',
    'coords_to_trilinear',
    'create_dense_spc',
]


def quantize_points(x, level):
    """Quantizes [-1, 1] coords to integer grid [0, 2^level - 1].

    Reference: ``kaolin/ops/spc/points.py:35``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> pts = jnp.asarray([[-1., -1., -1.], [0., 0., 0.],
        ...                    [0.999, 0.999, 0.999]])
        >>> print(np.asarray(quantize_points(pts, 2)))
        [[0 0 0]
         [2 2 2]
         [3 3 3]]
    """
    res = 2 ** level
    return jnp.floor(jnp.clip(res * (x + 1.0) / 2.0, 0, res - 1.)
                     ).astype(jnp.int16)


def _spread3(v):
    """Spreads 16 bits of v so there are 2 zero bits between each
    (morton interleave helper); works on jnp or numpy int64."""
    m = v & 0xFFFF
    m = (m | (m << 16)) & 0x0000FF0000FF
    m = (m | (m << 8)) & 0x00F00F00F00F
    m = (m | (m << 4)) & 0x0C30C30C30C3
    m = (m | (m << 2)) & 0x249249249249
    return m


def _compact3(v):
    m = v & 0x249249249249
    m = (m | (m >> 2)) & 0x0C30C30C30C3
    m = (m | (m >> 4)) & 0x00F00F00F00F
    m = (m | (m >> 8)) & 0x0000FF0000FF
    m = (m | (m >> 16)) & 0xFFFF
    return m


def points_to_morton(points):
    """(Quantized) 3D points to morton codes (int64).

    Reference: ``kaolin/ops/spc/points.py:79``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> pts = jnp.asarray([[0, 0, 0], [0, 0, 1], [1, 0, 0]],
        ...                   jnp.int16)
        >>> print(np.asarray(points_to_morton(pts)))
        [0 1 4]
    """
    shape = points.shape[:-1]
    p = points.reshape(-1, 3).astype(jnp.int64)
    code = (_spread3(p[:, 0]) << 2) | (_spread3(p[:, 1]) << 1) \
        | _spread3(p[:, 2])
    return code.reshape(shape)


def morton_to_points(morton):
    """Morton codes to (quantized) 3D points (int16).

    Reference: ``kaolin/ops/spc/points.py:107``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> print(np.asarray(morton_to_points(jnp.asarray([0, 1, 4]))))
        [[0 0 0]
         [0 0 1]
         [1 0 0]]
    """
    shape = tuple(morton.shape) + (3,)
    m = morton.reshape(-1).astype(jnp.int64)
    x = _compact3(m >> 2)
    y = _compact3(m >> 1)
    z = _compact3(m)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int16).reshape(shape)


def points_to_corners(points):
    """The 8 corners of each voxel (point = corner 0), morton corner order.

    Reference: ``kaolin/ops/spc/points.py:133``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> corners = points_to_corners(jnp.asarray([[1, 2, 3]],
        ...                                         jnp.int16))
        >>> print(np.asarray(corners[0, :3]))
        [[1 2 3]
         [1 2 4]
         [1 3 3]]
    """
    i = jnp.arange(8)
    offs = jnp.stack([(i >> 2) & 1, (i >> 1) & 1, i & 1],
                     axis=-1).astype(points.dtype)
    return points[..., None, :] + offs


def _morton_np(points):
    p = np.asarray(points, dtype=np.int64)

    def spread(v):
        m = v & 0xFFFF
        m = (m | (m << 16)) & 0x0000FF0000FF
        m = (m | (m << 8)) & 0x00F00F00F00F
        m = (m | (m << 4)) & 0x0C30C30C30C3
        m = (m | (m << 2)) & 0x249249249249
        return m

    return (spread(p[:, 0]) << 2) | (spread(p[:, 1]) << 1) | spread(p[:, 2])


def unbatched_points_to_octree(points, level, sorted=False):
    """Builds an octree byte stream from quantized 3D points (host numpy).

    Reference: ``kaolin/ops/spc/points.py:53`` (CUDA ``points_to_octree``).
    Bytes are breadth-first, levels 0..level-1; bit ``i`` of a byte marks
    occupancy of child octant ``i = x<<2 | y<<1 | z``.

    Returns:
        jnp uint8 array of octree bytes.
    """
    pts = np.asarray(points)
    from ...native import points_to_octree_fast
    fast = points_to_octree_fast(pts.reshape(-1, 3), level)
    if fast is not None:
        return jnp.asarray(fast)
    morton = np.unique(_morton_np(pts.reshape(-1, 3)))
    octree_levels = []
    cur = morton
    for lvl in range(level, 0, -1):
        parents = cur >> 3
        child = (cur & 7).astype(np.int64)
        uniq_parents, inverse = np.unique(parents, return_inverse=True)
        bytes_ = np.zeros(uniq_parents.shape[0], dtype=np.uint8)
        np.bitwise_or.at(bytes_, inverse, (1 << child).astype(np.uint8))
        octree_levels.append(bytes_)
        cur = uniq_parents
    octree_levels.reverse()
    return jnp.asarray(np.concatenate(octree_levels))


def coords_to_trilinear_coeffs(coords, points, level):
    """Trilinear interpolation coefficients w.r.t. the voxel corners.

    Reference: ``kaolin/ops/spc/points.py:309``. Corner order matches
    :func:`points_to_corners`.
    """
    shape = tuple(points.shape[:-1]) + (8,)
    p = points.reshape(-1, 3).astype(coords.dtype)
    c = coords.reshape(-1, 3)
    x = (2 ** level) * (c * 0.5 + 0.5) - p
    i = jnp.arange(8)
    bx = ((i >> 2) & 1).astype(coords.dtype)
    by = ((i >> 1) & 1).astype(coords.dtype)
    bz = (i & 1).astype(coords.dtype)
    wx = bx[None] * x[:, 0:1] + (1 - bx)[None] * (1 - x[:, 0:1])
    wy = by[None] * x[:, 1:2] + (1 - by)[None] * (1 - x[:, 1:2])
    wz = bz[None] * x[:, 2:3] + (1 - bz)[None] * (1 - x[:, 2:3])
    return (wx * wy * wz).reshape(shape)


def unbatched_interpolate_trilinear(coords, pidx, point_hierarchy, trinkets,
                                    feats, level):
    """Trilinear interpolation on an SPC feature grid (differentiable).

    Reference: ``kaolin/ops/spc/points.py:244`` (CUDA
    ``interpolate_trilinear_cuda`` + custom VJP; here plain XLA gathers +
    weighted sum, autodiff provides the backward scatter).

    Args:
        coords: (num_coords, num_samples, 3) in [-1, 1].
        pidx: (num_coords,) int indices into the point hierarchy (level
            ``level``), e.g. from :func:`unbatched_query`; -1 for misses
            (result 0).
        point_hierarchy: (num_points, 3) int16.
        trinkets: (num_points, 8) int corner indices into ``feats``.
        feats: (num_feats, feature_dim).
        level: octree level of the query.

    Returns:
        (num_coords, num_samples, feature_dim).
    """
    valid = pidx >= 0
    safe = jnp.maximum(pidx, 0)
    voxel = jnp.take(point_hierarchy, safe, axis=0)           # (N, 3)
    voxel_b = jnp.broadcast_to(voxel[:, None, :].astype(coords.dtype),
                               coords.shape)
    coeffs = coords_to_trilinear_coeffs(coords, voxel_b, level)  # (N, S, 8)
    corner_idx = jnp.take(trinkets, safe, axis=0)             # (N, 8)
    corner_feats = jnp.take(feats, corner_idx, axis=0)        # (N, 8, D)
    out = jnp.einsum('nsk,nkd->nsd', coeffs, corner_feats)
    return jnp.where(valid[:, None, None], out, 0.)


def create_dense_spc(level):
    """Creates a fully-dense SPC octree at ``level``.

    Reference: ``kaolin/ops/spc/points.py:339``.
    """
    length = sum(8 ** l for l in range(level))
    octree = jnp.full((length,), 255, dtype=jnp.uint8)
    return octree, np.array([length], dtype=np.int32)


def coords_to_trilinear(coords, points, level=None):
    """Deprecated alias of :func:`coords_to_trilinear_coeffs`
    (reference ``kaolin/ops/spc/points.py:309`` keeps it for
    backward compatibility)."""
    import warnings
    warnings.warn('coords_to_trilinear is deprecated, '
                  'use coords_to_trilinear_coeffs instead',
                  DeprecationWarning)
    return coords_to_trilinear_coeffs(coords, points, level)
