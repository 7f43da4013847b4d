"""Random test-data generators.

Reference: ``kaolin/ops/random.py:23-204``. JAX-native: explicit PRNG keys
instead of global seeding (a module-level key helper is provided for parity
with ``manual_seed``).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'manual_seed',
    'get_key',
    'get_state',
    'set_state',
    'random_shape_per_tensor',
    'random_tensor',
    'sample_spherical_coords',
    'random_spc_octrees',
]

_GLOBAL_KEY = [jax.random.PRNGKey(0)]
_NP_RNG = [np.random.default_rng(0)]


def manual_seed(seed):
    """Sets the module-level PRNG seed (reference: ``kaolin/ops/random.py:23``)."""
    _GLOBAL_KEY[0] = jax.random.PRNGKey(seed)
    _NP_RNG[0] = np.random.default_rng(seed)


def get_key():
    """Splits and returns a fresh key from the module-level PRNG state."""
    _GLOBAL_KEY[0], sub = jax.random.split(_GLOBAL_KEY[0])
    return sub


def random_shape_per_tensor(batch_size, min_shape=None, max_shape=None):
    """Generates random ``shape_per_tensor`` (host numpy, static metadata).

    Reference: ``kaolin/ops/random.py:80``.
    """
    if max_shape is None:
        raise ValueError("max_shape must be provided")
    max_shape = np.asarray(max_shape)
    if min_shape is None:
        min_shape = np.ones_like(max_shape)
    min_shape = np.asarray(min_shape)
    return _NP_RNG[0].integers(min_shape, max_shape + 1,
                               size=(batch_size, len(max_shape))).astype(np.int64)


def random_tensor(low, high, shape, dtype=jnp.float32, key=None):
    """Generates a random tensor in [low, high] (reference: ``random.py:107``)."""
    if key is None:
        key = get_key()
    if jnp.issubdtype(dtype, jnp.integer):
        return jax.random.randint(key, shape, int(low), int(high) + 1, dtype=dtype)
    if dtype == jnp.bool_:
        return jax.random.bernoulli(key, 0.5, shape)
    return jax.random.uniform(key, shape, dtype=dtype, minval=low, maxval=high)


def sample_spherical_coords(shape, azimuth_low=0., azimuth_high=2. * np.pi,
                            elevation_low=0., elevation_high=np.pi / 2.,
                            key=None):
    """Samples azimuth / elevation angles uniformly over the sphere patch.

    Reference: ``kaolin/ops/random.py:175`` — elevation is sampled with a
    sin-uniform distribution so points are uniform on the sphere surface.
    
    Example:
        >>> manual_seed(0)
        >>> az, el = sample_spherical_coords((2,))
        >>> az.shape, bool((az >= 0).all())
        ((2,), True)
    """
    if key is None:
        key = get_key()
    k1, k2 = jax.random.split(key)
    azimuth = jax.random.uniform(k1, shape, minval=azimuth_low, maxval=azimuth_high)
    sin_lo = np.sin(elevation_low)
    sin_hi = np.sin(elevation_high)
    elevation = jnp.arcsin(
        jax.random.uniform(k2, shape, minval=sin_lo, maxval=sin_hi))
    return azimuth, elevation


def random_spc_octrees(batch_size, max_level, key=None):
    """Generates random structured-point-cloud octrees.

    Reference: ``kaolin/ops/random.py:139``. Returns (octrees, lengths):
    ``octrees`` is a flat uint8 array of breadth-first child-occupancy bytes
    for the whole batch, ``lengths`` the per-octree byte counts (host numpy).
    """
    rng = _NP_RNG[0] if key is None else np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    out_bytes = []
    lengths = []
    for _ in range(batch_size):
        octree = []
        cur_num_nodes = 1
        for _level in range(max_level):
            cur_bytes = rng.integers(1, 256, size=(cur_num_nodes,)).astype(np.uint8)
            octree.append(cur_bytes)
            cur_num_nodes = int(np.sum([bin(b).count('1') for b in cur_bytes]))
        octree = np.concatenate(octree)
        out_bytes.append(octree)
        lengths.append(octree.shape[0])
    return jnp.asarray(np.concatenate(out_bytes)), np.asarray(lengths, dtype=np.int64)


def get_state():
    """Returns the module-level generator states
    (reference ``kaolin/ops/random.py:58``; here a (jax_key,
    numpy_bit_generator_state) pair instead of torch/random/numpy
    triples)."""
    return (_GLOBAL_KEY[0], _NP_RNG[0].bit_generator.state)


def set_state(state):
    """Restores states captured by :func:`get_state`
    (reference ``kaolin/ops/random.py:39``)."""
    key, np_state = state
    _GLOBAL_KEY[0] = key
    _NP_RNG[0].bit_generator.state = np_state
