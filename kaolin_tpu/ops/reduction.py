"""Segment reductions over packed tensors.

Reference: ``kaolin/ops/reduction.py:42`` (``packed_simple_sum`` backed by
``packed_simple_sum_cuda``). On TPU these are single deterministic XLA
``segment_sum`` calls — no custom kernel needed.
"""

import numpy as np
import jax.numpy as jnp
import jax

from .batch import segment_ids_from_numel

__all__ = ['packed_simple_sum']


def packed_simple_sum(packed_tensor, numel_per_tensor):
    """Sums each sub-tensor of a packed tensor.

    Args:
        packed_tensor: (total_numel, last_dim) array.
        numel_per_tensor: 1D host int array of per-tensor element counts.

    Returns:
        jnp.ndarray of shape (batch_size,): per-sub-tensor sums over all
        elements (including the last dim, matching the reference).
    
    Example:
        >>> import jax.numpy as jnp
        >>> packed = jnp.asarray([[1., 2.], [3., 4.], [5., 6.]])
        >>> print(np.asarray(packed_simple_sum(packed,
        ...                                    np.asarray([2, 1]))))
        [10. 11.]
    """
    numel = np.asarray(numel_per_tensor)
    seg = segment_ids_from_numel(numel)
    per_row = jnp.sum(packed_tensor, axis=-1)
    return jax.ops.segment_sum(per_row, seg, num_segments=int(numel.shape[0]))
