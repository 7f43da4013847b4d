"""Voxelgrid operations: downsample, surface extraction, filling,
orthographic depth maps.

Reference: ``kaolin/ops/voxelgrid.py:21-390``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import ndimage

__all__ = ['downsample', 'extract_surface', 'fill', 'extract_odms',
           'project_odms']


def _avg_pool3d(x, kernel, stride=None, padding=0):
    """3D average pooling on (B, X, Y, Z) via reduce_window."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if stride is None:
        stride = kernel
    elif isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    window = (1,) + tuple(kernel)
    strides = (1,) + tuple(stride)
    pads = ((0, 0),) + tuple((p, p) for p in padding)
    summed = jax.lax.reduce_window(x, 0., jax.lax.add, window, strides,
                                   pads)
    return summed / float(np.prod(kernel))


def downsample(voxelgrids, scale):
    """Average-pools a voxelgrid down by ``scale`` per dimension.

    Reference: ``kaolin/ops/voxelgrid.py:21``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> vg = jnp.ones((1, 4, 4, 4))
        >>> print(downsample(vg, [2, 2, 2]).shape)
        (1, 2, 2, 2)
    """
    if isinstance(scale, (list, tuple)):
        if len(scale) != 3:
            raise ValueError(f"Expected scale to have 3 dimensions "
                             f"but got {len(scale)} dimensions.")
    elif not isinstance(scale, int):
        raise TypeError(f"Expected scale to be type list or int "
                        f"but got {type(scale)}.")
    if voxelgrids.ndim != 4:
        raise ValueError(f"Expected voxelgrids to have 4 dimensions "
                         f"but got {voxelgrids.ndim} dimensions.")
    scale3 = (scale,) * 3 if isinstance(scale, int) else tuple(scale)
    for i, s in enumerate(scale3):
        if s < 1:
            raise ValueError(f"Downsample ratio must be at least 1 along "
                             f"every dimension but got {s} at index {i}.")
        if s > voxelgrids.shape[i + 1]:
            raise ValueError(
                f"Downsample ratio must be less than voxelgrids shape of "
                f"{voxelgrids.shape[i + 1]} at index {i}, but got {s}.")
    return _avg_pool3d(voxelgrids.astype(jnp.float32), scale3)


def extract_surface(voxelgrids, mode="wide"):
    """Removes internal voxels, keeping the surface shell.

    Reference: ``kaolin/ops/voxelgrid.py:92``. "wide": any filled voxel
    with a vertex touching an empty voxel; "thin": a face touching.
    """
    if voxelgrids.ndim != 4:
        raise ValueError(f"Expected voxelgrids to have 4 dimensions "
                         f"but got {voxelgrids.ndim} dimensions.")
    vg = voxelgrids.astype(jnp.float32)
    if mode == "wide":
        avg = _avg_pool3d(vg, (3, 3, 3), stride=1, padding=1)
        return (avg < 1) & (vg > 0)
    elif mode == "thin":
        ax = _avg_pool3d(vg, (3, 1, 1), stride=1, padding=(1, 0, 0))
        ay = _avg_pool3d(vg, (1, 3, 1), stride=1, padding=(0, 1, 0))
        az = _avg_pool3d(vg, (1, 1, 3), stride=1, padding=(0, 0, 1))
        return ((ax < 1) | (ay < 1) | (az < 1)) & (vg > 0)
    raise ValueError(f'mode "{mode}" is not supported.')


def fill(voxelgrids):
    """Fills internal holes (host scipy flood fill; non-differentiable).

    Reference: ``kaolin/ops/voxelgrid.py:143``.
    """
    if voxelgrids.ndim != 4:
        raise ValueError(f"Expected voxelgrids to have 4 dimensions "
                         f"but got {voxelgrids.ndim} dimensions.")
    vg = np.asarray(voxelgrids)
    out = np.stack([ndimage.binary_fill_holes(vg[i])
                    for i in range(vg.shape[0])])
    return jnp.asarray(out)


def extract_odms(voxelgrids):
    """Orthographic depth maps from the 6 primary viewing directions.

    Reference: ``kaolin/ops/voxelgrid.py:208``. Returns (B, 6, dim, dim)
    int: depth to the first filled voxel per direction (dim = no hit).
    """
    vg = voxelgrids.astype(jnp.float32)
    dim = vg.shape[-1]
    mult = jnp.arange(1, dim + 1)
    rev = jnp.arange(dim, 0, -1)
    full = jnp.concatenate([mult, rev]).astype(vg.dtype)
    z = vg[:, None] * full.reshape(1, 2, 1, 1, -1)
    z_vals = jnp.max(z, axis=4)
    y = vg[:, None] * full.reshape(1, 2, 1, -1, 1)
    y_vals = jnp.max(y, axis=3)
    x = vg[:, None] * full.reshape(1, 2, -1, 1, 1)
    x_vals = jnp.max(x, axis=2)
    return (dim - jnp.concatenate([z_vals, y_vals, x_vals], axis=1)
            ).astype(jnp.int64)


def project_odms(odms, voxelgrids=None, votes=1):
    """Projects orthographic depth maps back onto a voxelgrid (carving).

    Reference: ``kaolin/ops/voxelgrid.py:307``.
    """
    if odms.shape[1] != 6:
        raise ValueError(f"Expected odms' second dimension to be 6, "
                         f"but got {odms.shape[1]} instead.")
    batch_size = odms.shape[0]
    dim = odms.shape[-1]
    if voxelgrids is None:
        voxelgrids = jnp.ones((batch_size, dim, dim, dim), bool)
    else:
        if voxelgrids.shape[0] != batch_size:
            raise ValueError(
                f"Expected voxelgrids and odms' batch size to be the same, "
                f"but got {batch_size} for odms and "
                f"{voxelgrids.shape[0]} for voxelgrid.")
        for i in voxelgrids.shape[1:]:
            if i != dim:
                raise ValueError(
                    f"Expected voxelgrids and odms' dimension size to be "
                    f"the same, but got {dim} for odms and {i} for "
                    f"voxelgrid.")
    u = odms.reshape(batch_size, 3, 2, dim, dim)
    u = u.at[:, :, 0].set(dim - u[:, :, 0])
    u = u.reshape(batch_size, 6, dim, dim)
    base = jnp.arange(dim)
    z_neg = (base.reshape(1, 1, 1, -1) >= u[:, 0][..., None]).astype(jnp.int32)
    z_pos = (base.reshape(1, 1, 1, -1) < u[:, 1][..., None]).astype(jnp.int32)
    y_neg = (base.reshape(1, 1, -1, 1) >= u[:, 2][:, :, None]).astype(jnp.int32)
    y_pos = (base.reshape(1, 1, -1, 1) < u[:, 3][:, :, None]).astype(jnp.int32)
    x_neg = (base.reshape(1, -1, 1, 1) >= u[:, 4][:, None]).astype(jnp.int32)
    x_pos = (base.reshape(1, -1, 1, 1) < u[:, 5][:, None]).astype(jnp.int32)
    total = z_neg + z_pos + y_neg + y_pos + x_neg + x_pos
    return (voxelgrids * votes - total) > 0
