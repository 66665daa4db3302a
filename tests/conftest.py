"""Test environment: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is validated on virtual host devices
(`xla_force_host_platform_device_count`), the idiomatic JAX analogue of a
fake-backend test cluster. Real-TPU behavior is exercised by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
