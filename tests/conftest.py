"""Test configuration: force CPU with a virtual 8-device mesh so
multi-chip sharding tests run anywhere (the driver separately dry-runs
the multichip path)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'float32')
