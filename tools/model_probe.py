#!/usr/bin/env python
"""Full-model device-time attribution for any bench ladder config.

block_probe.py times the 40-layer block stack under structural variants;
this tool instead profiles the PRODUCTION full-model apply (patch embed +
scanned trunk + head, exactly what bench.py measures) and attributes
device time per XLA op/fusion so the next kernel target is chosen from
evidence, not theory.

Usage:
  python tools/model_probe.py --int8 --fq --v3 --flat [--batch 128]
  python tools/model_probe.py --bf16 --v3
Output: per-op-category device ms/call table + top individual ops, and
the optimized HLO saved to --hlodir for fusion-name lookup.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {k for k, v in pids.items() if "TPU" in v}
    return [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev]


_CATS = [
    ("attention-kernel", re.compile(r"custom-call|tpu_custom_call|attn")),
    ("ln/quant-kernel", re.compile(r"ln_quant|act_quant|ln_bf16")),
    ("convert/copy", re.compile(r"^(copy|convert|bitcast|transpose|reshape)")),
    ("dot/fusion", re.compile(r"^(fusion|dot|cublas|loop_fusion)")),
    ("dynamic-update", re.compile(r"dynamic")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--fq", action="store_true")
    ap.add_argument("--v2", action="store_true")
    ap.add_argument("--v3", action="store_true")
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--lnk", action="store_true")
    ap.add_argument("--tp", action="store_true", help="pad_tokens 257->264")
    ap.add_argument("--fm", action="store_true", help="fused int8 MLP")
    ap.add_argument("--hg", type=int, default=8, help="v3 head group")
    ap.add_argument("--bf16", action="store_true", help="(default)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--hlodir", type=str, default="/tmp/modelhlo")
    ap.add_argument("--tracedir", type=str, default="/tmp/modeltrace")
    args = ap.parse_args()

    sys.argv = [sys.argv[0]]  # bench.main() flag parsing is not invoked
    import bench

    t0 = time.perf_counter()
    params, cfg = bench.build_host_params(padded_heads=False)
    print(f"# host params in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from hirest_tpu.models.eva_scan import stage_scanned_params
    from hirest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.perf_counter()
    staged = stage_scanned_params(params, cfg, int8=args.int8,
                                  dtype=jnp.bfloat16)
    print(f"# staged in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    apply = bench.build_eva_apply(
        params, cfg, int8=args.int8, fused_quant=args.fq and args.int8,
        attn_v2=args.v2, attn_v3=args.v3, attn_hg=args.hg, flat2d=args.flat,
        fused_ln=args.lnk, pad_tokens=args.tp,
        fused_mlp=args.fm and args.int8, staged=staged)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.image_size, cfg.image_size, 3), np.float32) * 0.3,
        jnp.bfloat16)

    # jax.block_until_ready is a NO-OP under the axon tunnel — a host
    # fetch of one output element is the only reliable execution barrier
    t0 = time.perf_counter()
    np.asarray(apply(x)[0, 0])
    print(f"# compile+first call {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    np.asarray(apply(x)[0, 0])  # warm

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for _ in range(args.iters):
            np.asarray(apply(x)[0, 0])

    ev = _device_events(args.tracedir)
    if not ev:
        print("no device events captured", file=sys.stderr)
        return
    by_name = {}
    for e in ev:
        n = e.get("name", "")
        if n.startswith("jit_"):
            continue  # the top-level program envelope double-counts ops
        by_name[n] = by_name.get(n, 0.0) + e["dur"]
    total = sum(by_name.values()) / args.iters / 1e3

    # category rollup
    cats = {}
    for n, us in by_name.items():
        for cname, pat in _CATS:
            if pat.search(n):
                cats[cname] = cats.get(cname, 0.0) + us
                break
        else:
            cats.setdefault("other", 0.0)
            cats["other"] += us
    print(f"\n== device time: {total:.1f} ms/call "
          f"(batch {args.batch} -> {args.batch / total * 1e3:.1f} fps-dev)")
    for cname, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        ms = us / args.iters / 1e3
        print(f"  {cname:<20s} {ms:8.1f} ms  {100 * ms / total:5.1f}%")

    print("\n== top 25 ops (ms/call):")
    for n, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / args.iters / 1e3:8.2f}  {n}")

    tag = ("int8" if args.int8 else "bf16") + ("+fq" if args.fq else "") \
        + ("+v2" if args.v2 else "") + ("+v3" if args.v3 else "") \
        + ("+flat" if args.flat else "") + ("+lnk" if args.lnk else "") \
        + ("+tp" if args.tp else "") \
        + ("+fm" if args.fm else "") \
        + (f"+hg{args.hg}" if args.hg != 8 else "")
    print(f"\n# trace in {args.tracedir} (perfetto); tag={tag}")


if __name__ == "__main__":
    main()
