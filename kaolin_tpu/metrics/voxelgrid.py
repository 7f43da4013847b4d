"""Voxelgrid metrics.

Reference: ``kaolin/metrics/voxelgrid.py:19-50``.
"""

import jax.numpy as jnp

__all__ = ['iou']


def iou(pred, gt):
    """Intersection-over-union of two (boolean-interpreted) voxelgrids.

    Args:
        pred, gt: (batch_size, X, Y, Z), same shape.

    Returns:
        (batch_size,) float IoU.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> pred = jnp.zeros((1, 2, 2, 2)).at[0, 0].set(1.)
        >>> gt = jnp.ones((1, 2, 2, 2))
        >>> print(round(float(iou(pred, gt)[0]), 5))
        0.5
    """
    if pred.shape != gt.shape:
        raise ValueError(
            f"Expected predicted voxelgrids and ground truth voxelgrids to "
            f"have the same shape, but got {pred.shape} and {gt.shape}.")
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    intersection = jnp.sum(pred & gt, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(pred | gt, axis=(1, 2, 3)).astype(jnp.float32)
    return intersection / union
