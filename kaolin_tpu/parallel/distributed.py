"""Multi-host (pod-slice) runtime initialization.

New TPU-native component (no reference counterpart — SURVEY §2.3 item 4):
the communication backend of this framework is XLA collectives over
ICI/DCN, reached through the JAX multi-process runtime. This module owns
the one piece of process-level state: ``jax.distributed.initialize``.

Launch recipe (one process per host, e.g. under a pod-slice scheduler)::

    JAX_COORDINATOR_ADDRESS=host0:8476 \
    JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$SLURM_PROCID \
    python train.py

and in ``train.py``, before any other JAX call::

    import kaolin_tpu as kal
    kal.parallel.init_distributed()
    mesh = kal.parallel.make_mesh()   # data over DCN, pix over ICI

On Cloud TPU pod slices the coordinator/process env vars are discovered
automatically by JAX; ``init_distributed()`` with no args and no env vars
set is a safe single-process no-op, so the same script runs unmodified on
one chip, one host, or a full slice.
"""

import os

import jax

__all__ = ['init_distributed', 'is_distributed']

_INITIALIZED = False


def _env_int(name):
    value = os.environ.get(name)
    return int(value) if value not in (None, '') else None


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initializes the JAX multi-process runtime (idempotent).

    Resolution order for each argument: explicit argument, then the
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` / ``JAX_LOCAL_DEVICE_IDS`` environment variables,
    then JAX's own cluster auto-detection (Cloud TPU metadata, SLURM,
    Open MPI). If nothing indicates a multi-process launch, this is a
    no-op and the process runs single-host.

    Must be called before any other JAX API touches the backend.

    Returns:
        (process_index, process_count) after initialization.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index(), jax.process_count()

    coordinator_address = (coordinator_address
                           or os.environ.get('JAX_COORDINATOR_ADDRESS'))
    if num_processes is None:
        num_processes = _env_int('JAX_NUM_PROCESSES')
    if process_id is None:
        process_id = _env_int('JAX_PROCESS_ID')
    if local_device_ids is None:
        raw = os.environ.get('JAX_LOCAL_DEVICE_IDS')
        if raw:
            local_device_ids = [int(x) for x in raw.split(',')]

    explicit = coordinator_address is not None
    auto = _cluster_autodetects()
    if not explicit and not auto:
        # Single-process launch: nothing to initialize.
        _INITIALIZED = True
        return 0, 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def _cluster_autodetects():
    """True when this process is unambiguously part of a multi-process
    launch that JAX's own auto-detection will resolve (SLURM, Open MPI,
    or a Cloud TPU pod slice spanning multiple workers).

    Deliberately uses only documented scheduler environment variables —
    no ``jax._src`` internals — and only engages when the world size is
    provably > 1, so a single-chip run never blocks waiting for a
    coordinator that will never answer.
    """
    for var in ('SLURM_NTASKS', 'OMPI_COMM_WORLD_SIZE'):
        raw = os.environ.get(var)
        if raw is not None:
            try:
                if int(raw) > 1:
                    return True
            except ValueError:
                pass
    # Cloud TPU pod slice: the runtime exposes the per-slice worker
    # hostnames; more than one worker means a multi-process job.
    hostnames = os.environ.get('TPU_WORKER_HOSTNAMES', '')
    return len([h for h in hostnames.split(',') if h.strip()]) > 1


def is_distributed():
    """True when running as part of a multi-process (multi-host) job."""
    return jax.process_count() > 1
