"""Test configuration: run JAX on a fake 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; the standard way to exercise
pjit/shard_map sharding is 8 virtual CPU devices. The ambient environment
pins JAX to the TPU tunnel (JAX_PLATFORMS=axon) in a way plain env vars
don't override in-process, so we use jax.config before any backend is
initialized. Set W2L_TEST_TPU=1 to run the suite against the real chip.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

if not os.environ.get('W2L_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
