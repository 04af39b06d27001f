"""Test configuration: run the suite on CPU with 8 virtual devices and 64-bit floats.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-run-compiles the multi-chip path on real topology); numerical oracle comparisons
need f64, which the TPU backend does not serve.

The sandbox preloads an `axon` TPU backend via sitecustomize, which latches
JAX_PLATFORMS before any conftest code runs — so the platform must be forced through
jax.config, not the environment.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the suite is dominated by hundreds of small XLA
# compiles, so repeat runs (every round, every xdist worker after the first
# populates it) drop from ~7 min to well under 3.  The directory is untracked;
# it persists on disk between runs in the same workspace.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(20260817)
