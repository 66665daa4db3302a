#!/usr/bin/env python
"""Probe: isolate per-matmul MFU for the EVA block's projections on TPU.

The device profile (BENCHLOG.md) shows the qkv matmul fusion at ~62% MFU
while the same-K MLP matmuls run ~93%, and the int8 qkv at only 1.14x bf16
while int8 MLP hits the true 2x. This tool times each projection shape in
isolation — scanned over 40 layers exactly like the model — to separate
"this matmul is inherently slow on this shape" from "the fusion context
(Pallas consumer, quant epilogue) is what's slow".

Usage: python tools/matmul_probe.py [--iters 8] [--batch 128]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

L = 40
S = 257
C = 1408


def _dyn_quant_rows(x):
    import jax.numpy as jnp

    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def build_case(name, batch, k, n, int8, flat):
    """-> (fn, args, flops_per_call) timing a 40-layer scanned x@W."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shape = (batch * S, k) if flat else (batch, S, k)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 0.02,
                    jnp.bfloat16)
    w = rng.standard_normal((L, k, n), dtype=np.float32) * 0.02

    if int8:
        ws = np.maximum(np.abs(w).max(axis=1) / 127.0, 1e-8)  # [L, n]
        wq = np.clip(np.round(w / ws[:, None, :]), -127, 127).astype(np.int8)
        xs = {"wq": jnp.asarray(wq), "ws": jnp.asarray(ws)}

        def body(carry, wdict):
            q, s = _dyn_quant_rows(carry)
            cdims = (((q.ndim - 1,), (0,)), ((), ()))
            acc = jax.lax.dot_general(q, wdict["wq"], cdims,
                                      preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * s * wdict["ws"]
            out = out.astype(jnp.bfloat16)
            # fold ALL output columns into the carry (a sliced fold lets XLA
            # dead-code-eliminate the unused columns of the matmul)
            carry = carry + jax.nn.relu(out).sum(-1, keepdims=True)
            return carry, None
    else:
        xs = {"w": jnp.asarray(w, jnp.bfloat16)}

        def body(carry, wdict):
            out = carry @ wdict["w"]
            carry = carry + jax.nn.relu(out).sum(-1, keepdims=True)
            return carry, None

    @jax.jit
    def run(x, xs):
        y, _ = jax.lax.scan(body, x, xs)
        return y.astype(jnp.float32).sum()

    flops = 2 * batch * S * k * n * L
    return lambda: run(x, xs), flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cases", type=str, default="")
    args = ap.parse_args()

    import jax

    print(f"# devices: {jax.devices()}")
    import bench

    peak = bench.chip_peak_bf16()  # device-kind lookup, not a v5e constant

    cases = []
    for name, k, n in [("qkv", C, 3 * C), ("fc1", C, 6144), ("out", C, C)]:
        for int8 in (False, True):
            for flat in (False, True):
                cases.append((f"{name}-{'int8' if int8 else 'bf16'}"
                              f"-{'2d' if flat else '3d'}", k, n, int8, flat))
    if args.cases:
        keep = args.cases.split(",")
        cases = [c for c in cases if any(s in c[0] for s in keep)]

    for name, k, n, int8, flat in cases:
        fn, flops = build_case(name, args.batch, k, n, int8, flat)
        t0 = time.perf_counter()
        np.asarray(fn())
        compile_s = time.perf_counter() - t0
        np.asarray(fn())  # warm
        start = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn()
        np.asarray(out)
        dt = (time.perf_counter() - start) / args.iters
        eff_peak = peak * (2 if int8 else 1)
        print(f"{name:16s} ms/call={dt * 1e3:8.1f}  "
              f"mfu(bf16)={flops / dt / peak * 100:5.1f}%  "
              f"mfu(native)={flops / dt / eff_peak * 100:5.1f}%  "
              f"compile={compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()
