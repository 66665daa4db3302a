#!/usr/bin/env python
"""Benchmark: EVA-CLIP-g frame-encoding throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "eva_clip_frames_per_sec_per_chip", "value": N,
   "unit": "frames/sec", "vs_baseline": N / 10000}

The baseline target (BASELINE.json) is 10k frames/sec/chip on v5e for the
EVA-CLIP encoder. Weights are random (not shipped in this image); weight
values do not affect throughput. bf16 params + activations (the production
configuration for the frozen tower).

NOTE on timing: under the axon TPU tunnel `jax.block_until_ready` returns
immediately; a host fetch (np.asarray) is the only reliable execution
barrier, so throughput is measured fetch-to-fetch (the [B, 1024] output
transfer is negligible).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 10_000.0


def bench_eva_vision(batch_size: int = 64, iters: int = 8, warmup: int = 2,
                     dtype_name: str = "bfloat16", use_pallas: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.utils.init import shape_only_init

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    tower = EvaVisionTower(EvaVisionConfig(), dtype=dtype, use_pallas=use_pallas)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch_size, 224, 224, 3)),
        dtype)
    params = shape_only_init(tower, imgs[:1])
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    fn = jax.jit(lambda p, x: tower.apply(p, x))
    np.asarray(fn(params, imgs))  # compile + first run

    for _ in range(warmup):
        np.asarray(fn(params, imgs))

    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(params, imgs)
    np.asarray(out)  # drains the serialized device queue
    elapsed = time.perf_counter() - start
    return batch_size * iters / elapsed


def main():
    batches = (128,)  # single size: each compile costs ~2-3 min via the tunnel
    # Pallas fused attention measured +12% over XLA (173 vs 154 fps) -> default on
    use_pallas = "--no-pallas" not in sys.argv
    for arg in sys.argv[1:]:
        if arg.startswith("--batch="):
            batches = (int(arg.split("=")[1]),)

    best = 0.0
    for b in batches:
        try:
            fps = bench_eva_vision(batch_size=b, use_pallas=use_pallas)
        except Exception as e:  # OOM etc.
            print(f"# batch {b} failed: {e}", file=sys.stderr)
            continue
        print(f"# batch {b}: {fps:.1f} fps", file=sys.stderr)
        best = max(best, fps)

    print(json.dumps({
        "metric": "eva_clip_frames_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "frames/sec",
        "vs_baseline": round(best / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
