"""Test configuration: force a virtual 8-device CPU platform so that sharding
tests run anywhere (the real TPU is reserved for benchmarks)."""

import os

# Force CPU even when the environment presets JAX_PLATFORMS (e.g. a TPU tunnel):
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
