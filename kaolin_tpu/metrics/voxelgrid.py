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
