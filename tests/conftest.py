"""Test configuration: force CPU with a virtual 8-device mesh so
multi-chip sharding tests run anywhere (the driver separately dry-runs
the multichip path)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

# NOTE: no jax_default_matmul_precision override here. Rounds 1-2 set
# 'float32', which silently masked the production default (bf16 MXU
# passes for any dot_general on TPU) from every test render while the
# CLI/bench paths ran bf16 — the frame-transform einsums biased glass
# chains by +4% film mean on matpreview and no test could see it.
# Device code now either uses explicit HIGHEST-precision dots (the
# intersect/gather matmuls) or elementwise vec3 contractions
# (core/math.py, core/transform.py), so tests run production numerics.
