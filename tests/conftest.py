"""Test environment: force an 8-device virtual CPU mesh before JAX is used.

This image exports JAX_PLATFORMS=axon (one real TPU through a tunnel), so
tests must override it hard — both the env var and jax_platforms config —
to run on virtual host devices (`xla_force_host_platform_device_count`),
the idiomatic JAX analogue of a fake-backend test cluster. Real-TPU
behavior is exercised by bench.py, not the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float32 torch; keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")
