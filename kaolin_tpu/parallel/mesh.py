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

    Single-process: defaults to all devices on the 'data' axis. In a
    multi-process (multi-host) job — after
    :func:`kaolin_tpu.parallel.init_distributed` — the global device
    list spans hosts; devices are then laid out process-major and the
    defaults become ``data = process_count`` (rides DCN between hosts)
    and ``pix = local device count`` (rides ICI within a host), so the
    bandwidth-hungry pixel-space collectives stay on-chip-interconnect.

    Args:
        data: size of the data-parallel axis (default: all devices if
            ``pix`` is unset, else ``n_devices // pix``; multi-process
            default: the process count).
        pix: size of the pixel-sharding axis (default 1, or
            ``n_devices // data`` if ``data`` given; multi-process
            default: devices per process).
        devices: explicit device list (default ``jax.devices()``).

    Returns:
        jax.sharding.Mesh with axes ('data', 'pix').
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_proc = len({d.process_index for d in devices})
    if data is None and pix is None:
        if n_proc > 1:
            data, pix = n_proc, n // n_proc
        else:
            data, pix = n, 1
    elif data is None:
        data = n // pix
    elif pix is None:
        pix = n // data
    assert data * pix == n, (data, pix, n)
    if n_proc > 1:
        # Process-major layout: each length-``pix`` mesh row must live
        # inside one process so its collectives ride ICI, not DCN.
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
        per_proc = n // n_proc
        if pix > 1 and per_proc % pix != 0:
            raise ValueError(
                f"pix={pix} does not divide the per-process device "
                f"count {per_proc}; pixel-axis collectives would "
                f"cross hosts (DCN)")
    dev_array = np.asarray(devices).reshape(data, pix)
    return Mesh(dev_array, ('data', 'pix'))
