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

# Persistent compile cache: XLA:CPU AOT entries reload on the SAME host
# (measured 2.3x on the dryrun; cross-host entries fail feature checks and
# recompile harmlessly). Repeat suite runs skip most of the compile-bound
# test time. Lives beside the repo so the driver's dryrun warms/reuses it.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
