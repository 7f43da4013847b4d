"""Rendering metrics: silhouette mask IoU.

Reference: ``kaolin/metrics/render.py:18-40``.
"""

import jax.numpy as jnp

__all__ = ['mask_iou']


def mask_iou(lhs_mask, rhs_mask):
    """IoU loss (1 - mean IoU) between two soft segmentation masks.

    Args:
        lhs_mask, rhs_mask: (batch_size, height, width).

    Returns:
        scalar loss.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> a = jnp.asarray([[[1., 1.], [0., 0.]]])
        >>> b = jnp.asarray([[[1., 0.], [0., 0.]]])
        >>> print(round(float(mask_iou(a, b)), 5))
        0.5
    """
    batch_size = lhs_mask.shape[0]
    assert rhs_mask.shape == lhs_mask.shape
    sil_mul = lhs_mask * rhs_mask
    sil_add = lhs_mask + rhs_mask
    iou_up = jnp.sum(sil_mul.reshape(batch_size, -1), axis=1)
    iou_down = jnp.sum((sil_add - sil_mul).reshape(batch_size, -1), axis=1)
    iou_neg = iou_up / (iou_down + 1e-10)
    return 1.0 - jnp.mean(iou_neg)
