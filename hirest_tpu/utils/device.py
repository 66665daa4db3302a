"""Backend platform selection for CLI entry points.

The reference's CLIs take ``--device`` (args.py:10, ``cuda`` default) and
every torch call site honors it. Here the analogue is the jax platform:
``--device cpu`` must pin jax to the CPU backend BEFORE the first backend
initialization — on this image the axon sitecustomize re-exports
``JAX_PLATFORMS=axon`` at interpreter startup, so the env var alone cannot
keep a process off the TPU tunnel; only ``jax.config.update`` can. A CLI
that skips this hangs indefinitely at device init when the tunnel is down,
even though the user explicitly asked for CPU.
"""

from __future__ import annotations


def apply_device_config(device: str) -> None:
    """Pin the jax platform for ``--device cpu`` runs (call before any jax
    backend touch). ``tpu`` (the default) leaves platform selection to the
    environment."""
    if device == "cpu":
        import os

        import jax

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
