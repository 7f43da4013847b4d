"""Device-mesh construction for multi-chip / multi-host rendering.

New TPU-native component (no reference counterpart — SURVEY §2.3): the
scale story is XLA collectives over ICI/DCN via ``jax.sharding.Mesh`` +
``shard_map``, axes ``('data', 'pix')``: mesh batch sharded over 'data',
pixel rows of each image sharded over 'pix'.
"""

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ['make_mesh', 'P', 'Mesh']


def make_mesh(data=None, pix=None, devices=None):
    """Builds a ``Mesh`` with axes ('data', 'pix').

    Args:
        data: size of the data-parallel axis (default: all devices if
            ``pix`` is unset, else ``n_devices // pix``).
        pix: size of the pixel-sharding axis (default 1, or
            ``n_devices // data`` if ``data`` given).
        devices: explicit device list (default ``jax.devices()``).

    Returns:
        jax.sharding.Mesh with axes ('data', 'pix').
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and pix is None:
        data, pix = n, 1
    elif data is None:
        data = n // pix
    elif pix is None:
        pix = n // data
    assert data * pix == n, (data, pix, n)
    dev_array = np.asarray(devices).reshape(data, pix)
    return Mesh(dev_array, ('data', 'pix'))
