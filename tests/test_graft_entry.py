"""Driver-contract tests for __graft_entry__.

The driver imports __graft_entry__ under the image-default axon platform
(ONE real device) and calls dryrun_multichip(8) directly — it does NOT run
the module's __main__ block. Round 1 failed exactly there (MULTICHIP_r01:
rc=1, "need 8 devices, have 1"), so this test reproduces the driver's call
shape: a fresh interpreter whose own jax has only one device, requiring
dryrun_multichip to self-provision the 8-device virtual CPU mesh in a
subprocess.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_one_device():
    env = dict(os.environ)
    # one CPU device stands in for the driver's one axon chip (initializing
    # the real tunnel from tests would contend with the single TPU client).
    # NOTE the env var alone does NOT keep jax off the axon tunnel in this
    # image — only jax.config.update does (measured: a JAX_PLATFORMS=cpu
    # subprocess still initializes the axon backend and hangs when the
    # tunnel is down). JAX_PLATFORMS_FORCE=cpu makes dryrun_multichip
    # apply the config update itself.
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORMS_FORCE"] = "cpu"
    env["XLA_FLAGS"] = ""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert jax.device_count() == 1, jax.device_count(); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('DRIVER_CALL_OK')")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_CALL_OK" in proc.stdout
    assert "dryrun_multichip(8) OK" in proc.stdout
    # the 8-device sharded step must numerically match a 1-device run
    # (VERDICT r3 #5) — _dryrun_impl asserts it and prints this line
    assert "parity vs 1-device" in proc.stdout
