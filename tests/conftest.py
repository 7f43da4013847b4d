"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests (shard_map over a Mesh) run anywhere.

XLA_FLAGS must be set before the backend initializes; the platform choice
goes through jax.config (the env var is overridden by the TPU plugin in
some environments). See SURVEY.md §4.9.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)


import gc

import pytest


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """In-process accumulation of XLA compile caches makes the full
    suite ~2x slower than the per-file sum on this 2-core host (jit
    cache pressure + GC); dropping caches between modules keeps the
    end-to-end run near the standalone timings."""
    yield
    jax.clear_caches()
    gc.collect()
