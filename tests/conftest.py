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
