"""Batched-tensor representations: list / packed / padded.

TPU-native counterpart of the reference batching layer
(``kaolin/ops/batch.py:72-372``). JAX requires static shapes under ``jit``, so:

- the *packed* representation is a concatenated ``(total_numel, last_dim)``
  ``jnp`` array plus a **host-side numpy** ``shape_per_tensor`` (shapes are
  static metadata, never traced);
- the *padded* representation is a dense ``jnp`` array padded with
  ``padding_value`` — the vmap-friendly default layout in this framework;
- segment reductions over packed tensors use ``jax.ops.segment_sum`` (XLA
  deterministic) instead of the reference's custom CUDA kernels
  (``kaolin/csrc/ops/packed_simple_sum_cuda.cu``,
  ``kaolin/csrc/ops/tile_to_packed_cuda.cu``).
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    'get_shape_per_tensor',
    'list_to_packed',
    'packed_to_list',
    'list_to_padded',
    'padded_to_list',
    'packed_to_padded',
    'padded_to_packed',
    'get_first_idx',
    'tile_to_packed',
    'fill_max_shape',
    'segment_ids_from_numel',
]


def get_shape_per_tensor(tensor_list):
    """Returns the shapes (excluding last dim) of each tensor in the list.

    Reference: ``kaolin/ops/batch.py:42-70``.

    Args:
        tensor_list: sequence of arrays with identical ndim.

    Returns:
        numpy.ndarray of shape (batch_size, ndim - 1), int64.
    """
    ndim = tensor_list[0].ndim
    for i, t in enumerate(tensor_list):
        if t.ndim != ndim:
            raise ValueError(f"Expected all tensors to have {ndim} dimensions "
                             f"but got {t.ndim} at index {i}")
    return np.array([t.shape[:-1] for t in tensor_list], dtype=np.int64)


def list_to_packed(tensor_list):
    """Concatenates a sequence of arrays into a single packed tensor.

    Reference: ``kaolin/ops/batch.py:72``.

    Returns:
        (jnp.ndarray, numpy.ndarray): packed tensor of shape
        ``(sum(prod(shape_i)), last_dim)`` and ``shape_per_tensor``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> packed, spt = list_to_packed(
        ...     [jnp.asarray([[0., 1.], [2., 3.]]), jnp.asarray([[4., 5.]])])
        >>> print(np.asarray(packed))
        [[0. 1.]
         [2. 3.]
         [4. 5.]]
        >>> print(spt)
        [[2]
         [1]]
    """
    shape_per_tensor = get_shape_per_tensor(tensor_list)
    last_dim = tensor_list[0].shape[-1]
    for i, t in enumerate(tensor_list):
        if t.shape[-1] != last_dim:
            raise ValueError(f"Expected all tensors to have last dimension {last_dim} "
                             f"but got {t.shape[-1]} at index {i}")
    packed = jnp.concatenate([jnp.reshape(t, (-1, last_dim)) for t in tensor_list],
                             axis=0)
    return packed, shape_per_tensor


def get_first_idx(numel_per_tensor):
    """First index of each sub-tensor in the packed tensor, plus the end index.

    Reference: ``kaolin/ops/batch.py:120``.

    Args:
        numel_per_tensor: 1D int array (numpy or jnp) of element counts.

    Returns:
        numpy.ndarray of shape (batch_size + 1,): ``[0, cumsum...]``.
    
    Example:
        >>> print(np.asarray(get_first_idx(np.asarray([2, 3, 1]))))
        [0 2 5 6]
    """
    numel = np.asarray(numel_per_tensor)
    out = np.zeros((numel.shape[0] + 1,), dtype=np.int64)
    np.cumsum(numel, axis=0, out=out[1:])
    return out


def packed_to_list(packed_tensor, shape_per_tensor, first_idx=None):
    """Splits a packed tensor back into a list of arrays.

    Reference: ``kaolin/ops/batch.py:179``.
    """
    shape_per_tensor = np.asarray(shape_per_tensor)
    numel = np.prod(shape_per_tensor, axis=1) if shape_per_tensor.ndim > 1 \
        else shape_per_tensor
    if first_idx is None:
        first_idx = get_first_idx(numel)
    else:
        first_idx = np.asarray(first_idx)
    last_dim = packed_tensor.shape[-1]
    out = []
    for i in range(shape_per_tensor.shape[0]):
        sub = packed_tensor[int(first_idx[i]):int(first_idx[i + 1])]
        out.append(jnp.reshape(sub, tuple(shape_per_tensor[i]) + (last_dim,)))
    return out


def fill_max_shape(shape_per_tensor, partial_max_shape=None):
    """Fills ``-1`` entries of a partial max shape with the per-dim maxima.

    Reference: ``kaolin/ops/batch.py:215``.
    """
    shape_per_tensor = np.asarray(shape_per_tensor)
    max_shape = shape_per_tensor.max(axis=0)
    if partial_max_shape is None:
        return max_shape
    partial = np.asarray(partial_max_shape).copy()
    mask = partial == -1
    partial[mask] = max_shape[mask]
    if np.any(partial < max_shape):
        raise ValueError(f"max_shape {tuple(partial)} is smaller than "
                         f"actual max shape {tuple(max_shape)}")
    return partial


def list_to_padded(tensor_list, padding_value=0., max_shape=None):
    """Stacks a sequence of arrays into a single padded dense tensor.

    Reference: ``kaolin/ops/batch.py:254``.

    Returns:
        (jnp.ndarray, numpy.ndarray): padded tensor of shape
        ``(batch_size, *max_shape, last_dim)`` and ``shape_per_tensor``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> padded, spt = list_to_padded(
        ...     [jnp.ones((1, 2)), jnp.ones((2, 2))], padding_value=-1.)
        >>> print(np.asarray(padded))
        [[[ 1.  1.]
          [-1. -1.]]
        <BLANKLINE>
         [[ 1.  1.]
          [ 1.  1.]]]
    """
    shape_per_tensor = get_shape_per_tensor(tensor_list)
    max_shape = fill_max_shape(shape_per_tensor, max_shape)
    last_dim = tensor_list[0].shape[-1]
    padded = []
    for t in tensor_list:
        pad_width = [(0, int(m) - s) for m, s in zip(max_shape, t.shape[:-1])]
        pad_width.append((0, 0))
        padded.append(jnp.pad(t, pad_width, constant_values=padding_value))
    out = jnp.stack(padded, axis=0)
    return out, shape_per_tensor


def padded_to_list(padded_tensor, shape_per_tensor):
    """Splits a padded tensor back into a list of (trimmed) arrays.

    Reference: ``kaolin/ops/batch.py:306``.
    """
    shape_per_tensor = np.asarray(shape_per_tensor)
    out = []
    for i in range(shape_per_tensor.shape[0]):
        idx = (i,) + tuple(slice(0, int(s)) for s in shape_per_tensor[i])
        out.append(padded_tensor[idx])
    return out


def packed_to_padded(packed_tensor, shape_per_tensor, first_idx=None,
                     padding_value=0., max_shape=None):
    """Converts a packed tensor to padded layout.

    Reference: ``kaolin/ops/batch.py:332``.
    """
    return list_to_padded(
        packed_to_list(packed_tensor, shape_per_tensor, first_idx),
        padding_value=padding_value, max_shape=max_shape)[0]


def padded_to_packed(padded_tensor, shape_per_tensor):
    """Converts a padded tensor to packed layout.

    Reference: ``kaolin/ops/batch.py:360``.
    """
    return list_to_packed(padded_to_list(padded_tensor, shape_per_tensor))[0]


def segment_ids_from_numel(numel_per_tensor, total=None):
    """Per-element segment (sub-tensor) ids for a packed tensor.

    TPU-native helper: the id array drives ``jax.ops.segment_sum``-family
    reductions, replacing the reference's packed CUDA kernels.

    Args:
        numel_per_tensor: 1D int host array of element counts.
        total: optional total element count (defaults to the sum).

    Returns:
        jnp.ndarray int32 of shape (total,).
    """
    numel = np.asarray(numel_per_tensor)
    if total is None:
        total = int(numel.sum())
    return jnp.asarray(np.repeat(np.arange(numel.shape[0]), numel), dtype=jnp.int32)


def tile_to_packed(values, numel_per_tensor):
    """Tiles per-tensor scalar values to packed layout, shape (total, 1).

    Reference: ``kaolin/ops/batch.py:144`` (CUDA kernel
    ``tile_to_packed_cuda``); here a single XLA gather.
    
    Example:
        >>> import jax.numpy as jnp
        >>> out = tile_to_packed(jnp.asarray([10., 20.]),
        ...                      np.asarray([2, 3]))
        >>> print(np.asarray(out)[:, 0])
        [10. 10. 20. 20. 20.]
    """
    seg = segment_ids_from_numel(numel_per_tensor)
    return jnp.take(jnp.asarray(values), seg, axis=0)[:, None]
