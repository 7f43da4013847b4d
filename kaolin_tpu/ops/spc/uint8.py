"""Bit-level helpers on octree bytes.

Reference: ``kaolin/ops/spc/uint8.py:29-125``. Bit ``i`` of an octree byte
is the occupancy of child octant ``i = x << 2 | y << 1 | z``.
"""

import jax.numpy as jnp

__all__ = ['uint8_to_bits', 'uint8_bits_sum', 'bits_to_uint8']


def uint8_to_bits(uint8_t):
    """Unpacks uint8 values to 8 booleans (bit 0 first).

    Reference: ``kaolin/ops/spc/uint8.py:29``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> bits = uint8_to_bits(jnp.asarray([5], jnp.uint8))
        >>> print(np.asarray(bits).astype(np.int32))
        [[1 0 1 0 0 0 0 0]]
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return ((uint8_t[..., None] >> shifts) & 1).astype(bool)


def uint8_bits_sum(uint8_t):
    """Number of set bits (children) per byte.

    Reference: ``kaolin/ops/spc/uint8.py:66``.
    """
    return jnp.bitwise_count(uint8_t).astype(jnp.int32)


def bits_to_uint8(bool_t):
    """Packs (..., 8) booleans into uint8 (bit 0 first).

    Reference: ``kaolin/ops/spc/uint8.py:95``.
    """
    weights = (1 << jnp.arange(8)).astype(jnp.int32)
    return jnp.sum(bool_t.astype(jnp.int32) * weights, axis=-1).astype(jnp.uint8)
