"""Test configuration: run JAX on a fake 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; the standard way to exercise
pjit/shard_map sharding is 8 virtual CPU devices via XLA_FLAGS. Must be set
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
