#!/usr/bin/env python
"""Dump the server-optimized HLO of the scanned EVA forward.

Through the axon tunnel, TPU compiles run server-side; this asks the
compiled executable for its optimized HLO text so fusion contents (e.g.
what shares a fusion with the qkv matmul) can be inspected directly.

Usage: python tools/dump_hlo.py [--int8] [--batch 128] [--out /tmp/eva.hlo]
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", type=str, default="/tmp/eva.hlo")
    ap.add_argument("--stablehlo", action="store_true",
                    help="dump unoptimized StableHLO instead (no compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from hirest_tpu.models import eva_scan

    params, cfg = bench.build_host_params(padded_heads=False)
    apply = eva_scan.build_scanned_vision_apply(
        params, cfg, int8=args.int8, use_pallas=True, dtype=jnp.bfloat16)

    # reach the underlying jitted fn and its bound args: apply is the
    # closure `lambda images: jitted(consts, xs, images)`
    free = dict(zip(apply.__code__.co_freevars,
                    [c.cell_contents for c in apply.__closure__]))
    imgs = jnp.zeros((args.batch, cfg.image_size, cfg.image_size, 3),
                     jnp.bfloat16)
    lowered = free["jitted"].lower(free["consts"], free["xs"], imgs)
    if args.stablehlo:
        text = lowered.as_text()
    else:
        t0 = time.time()
        compiled = lowered.compile()
        print(f"# compiled in {time.time() - t0:.1f}s", flush=True)
        text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"# wrote {len(text)} bytes to {args.out}")


if __name__ == "__main__":
    main()
