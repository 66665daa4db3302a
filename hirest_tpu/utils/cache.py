"""Persistent XLA compilation cache.

Cold compiles of the big towers take 2-3 minutes through a tunneled chip;
the persistent cache makes reruns hit disk instead. Enabled by every CLI
entry point; set HIREST_CACHE_DIR to relocate (default ~/.cache/hirest_tpu).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    cache_dir = (cache_dir or os.environ.get("HIREST_CACHE_DIR")
                 or os.path.expanduser("~/.cache/hirest_tpu/xla"))
    try:
        import jax

        if jax.default_backend() == "cpu":
            # XLA's CPU AOT cache re-loads with machine-feature mismatch
            # warnings; the win is on the (slow-compiling) TPU path anyway
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")
        return None
