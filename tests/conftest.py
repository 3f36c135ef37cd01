"""Test configuration: force a virtual 8-device CPU platform so that sharding
tests run anywhere (the real TPU is reserved for benchmarks).

Note: this environment's JAX build ignores the JAX_PLATFORMS env var (the
default is pinned to 'axon,cpu'), so the platform must be forced through
jax.config before any backend initializes.
"""

import os
import sys

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
