#!/usr/bin/env python
"""Block-level probe for the scanned EVA trunk: per-variant timing + HLO.

Times the 40-layer block stack (no patch embed / head) under structural
variants to attribute the qkv-matmul slowdown (BENCHLOG.md device profile:
qkv ~62% MFU vs fc1/fc2 ~93% at identical M/K/N):

  base        — production block (fused qkv matmul -> Pallas attention)
  noattn      — attention replaced by q3+k3+v3 (all qkv columns stay live,
                no Pallas call; isolates the custom call's effect)
  barrier-ln  — optimization_barrier between LN1 and the qkv matmul
                (blocks producer fusion into the dot)
  split3      — q/k/v as three separate matmuls feeding the packed kernel
  attn-xla    — no Pallas anywhere (XLA attention reference)

Each variant is lowered + compiled explicitly; the optimized HLO text is
saved to --hlodir so profiler fusion names can be matched to their
contents. Run under the axon tunnel (real chip).

Usage: python tools/block_probe.py [--variants base,noattn,...] [--int8]
       [--iters 4] [--batch 128] [--trace base]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 40
S = 257
C = 1408
HEADS = 16
D = 88
MLP = 6144
EPS = 1e-6
SCALE = D ** -0.5


def host_stacked(rng):
    g = lambda *s: rng.standard_normal(s, dtype=np.float32) * 0.02
    return {
        "norm1_scale": np.ones((L, C), np.float32),
        "norm1_bias": np.zeros((L, C), np.float32),
        "norm2_scale": np.ones((L, C), np.float32),
        "norm2_bias": np.zeros((L, C), np.float32),
        "qkv_w": g(L, C, 3 * C),
        "q_bias": g(L, C),
        "v_bias": g(L, C),
        "out_w": g(L, C, C),
        "out_b": g(L, C),
        "fc1_w": g(L, C, MLP),
        "fc1_b": g(L, MLP),
        "fc2_w": g(L, MLP, C),
        "fc2_b": g(L, C),
    }


def build(variant: str, int8: bool, batch: int, interpret: bool = False):
    import functools as ft

    import jax
    import jax.numpy as jnp

    from hirest_tpu.models.eva_scan import (_dyn_quant_rows, _int8_mm, _ln,
                                            _quantize_stacked)
    from hirest_tpu.models.layers import gelu
    from hirest_tpu.ops import attention as A
    from hirest_tpu.ops import quant as Q

    # interpret=True (--cpu) runs every Pallas kernel in interpret mode so
    # variant plumbing can be pre-verified off the tunnel
    fused_attention_packed = ft.partial(A.fused_attention_packed,
                                        interpret=interpret)
    fused_attention_qkv = ft.partial(A.fused_attention_qkv,
                                     interpret=interpret)
    fused_attention_qkv2 = ft.partial(A.fused_attention_qkv2,
                                      interpret=interpret)
    fused_attention_qkv3 = ft.partial(A.fused_attention_qkv3,
                                      interpret=interpret)
    fused_attention_flat = ft.partial(A.fused_attention_flat,
                                      interpret=interpret)
    ln_quant = ft.partial(Q.ln_quant, interpret=interpret)
    act_quant = ft.partial(Q.act_quant, interpret=interpret)
    ln_bf16 = ft.partial(Q.ln_bf16, interpret=interpret)

    rng = np.random.default_rng(0)
    stacked = host_stacked(rng)
    dtype = jnp.bfloat16

    if int8:
        xs = {k: jnp.asarray(v, dtype) for k, v in stacked.items()
              if not k.endswith("_w")}
        for name in ("qkv", "out", "fc1", "fc2"):
            q, s = _quantize_stacked(stacked[name + "_w"])
            xs[name + "_wq"], xs[name + "_ws"] = q, s
    else:
        xs = {k: jnp.asarray(v, dtype) for k, v in stacked.items()}

    def project_qkv(h, w):
        if int8:
            h_q, h_s = _dyn_quant_rows(h)
            return _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], None, dtype)
        return h @ w["qkv_w"]

    def mm(x, w, name):
        if int8:
            x_q, x_s = _dyn_quant_rows(x)
            return _int8_mm(x_q, x_s, w[name + "_wq"], w[name + "_ws"],
                            w[name + "_b"], dtype)
        return x @ w[name + "_w"] + w[name + "_b"]

    fences = "fences" in variant
    fq = "fq" in variant  # fused LN/gelu/attention quantization kernels
    from hirest_tpu.models.layers import gelu_bf16_poly
    act = gelu_bf16_poly if "fastgelu" in variant else gelu
    if fq:
        assert int8, "fq variants require --int8"

    def block_fq(x, w):
        h_q, h_s = ln_quant(x, w["norm1_scale"], w["norm1_bias"], EPS)
        if "attn2" in variant or "attn3" in variant:
            bias3 = jnp.concatenate([w["q_bias"],
                                     jnp.zeros_like(w["q_bias"]),
                                     w["v_bias"]], -1)
            qkv = _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], bias3, dtype)
            fn = (fused_attention_qkv3 if "attn3" in variant
                  else fused_attention_qkv2)
            a_q, a_s = fn(qkv, SCALE, HEADS, quant_out=True)
        else:
            qkv = _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], None, dtype)
            a_q, a_s = fused_attention_qkv(qkv, w["q_bias"], w["v_bias"],
                                           SCALE, HEADS, quant_out=True)
        x = x + _int8_mm(a_q, a_s, w["out_wq"], w["out_ws"], w["out_b"], dtype)
        if fences:
            x = jax.lax.optimization_barrier(x)
        h_q, h_s = ln_quant(x, w["norm2_scale"], w["norm2_bias"], EPS)
        h = _int8_mm(h_q, h_s, w["fc1_wq"], w["fc1_ws"], w["fc1_b"], dtype)
        gact = "gelu_poly" if "fastgelu" in variant else "gelu"
        h_q, h_s = act_quant(h, act=gact)
        x = x + _int8_mm(h_q, h_s, w["fc2_wq"], w["fc2_ws"], w["fc2_b"], dtype)
        if fences:
            x = jax.lax.optimization_barrier(x)
        return x, None

    def block_attn2(x, w):
        h = _ln(x, w["norm1_scale"], w["norm1_bias"], EPS)
        bias3 = jnp.concatenate([w["q_bias"], jnp.zeros_like(w["q_bias"]),
                                 w["v_bias"]], -1)
        if int8:
            h_q, h_s = _dyn_quant_rows(h)
            qkv = _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], bias3, dtype)
        else:
            qkv = (h @ w["qkv_w"] + bias3).astype(dtype)
        att = (fused_attention_qkv3(qkv, SCALE, HEADS)
               if "attn3" in variant else fused_attention_qkv2(qkv, SCALE,
                                                               HEADS))
        x = x + mm(att, w, "out")
        if fences:
            x = jax.lax.optimization_barrier(x)
        h = _ln(x, w["norm2_scale"], w["norm2_bias"], EPS)
        h = act(mm(h, w, "fc1"))
        x = x + mm(h, w, "fc2")
        if fences:
            x = jax.lax.optimization_barrier(x)
        return x, None

    lnk = "lnk" in variant  # bf16 pallas LayerNorm (ops/quant.ln_bf16)

    def ln_site(x, scale_, bias_):
        """One LN site: pallas one-pass kernel ('lnk') or XLA LN, fenced."""
        if lnk and not int8:
            return ln_bf16(x, scale_, bias_, EPS,
                           row_block=S if x.ndim == 2 else None)
        h = _ln(x, scale_, bias_, EPS)
        return jax.lax.optimization_barrier(h) if fences else h

    def block_flat(x, w):
        """Flat [B*S, C] trunk (2D dots, no 3D layout negotiation); composes
        with 'attn2'/'attn3' (pre-added biases + lean kernels), 'lnk', int8."""
        h = ln_site(x, w["norm1_scale"], w["norm1_bias"])
        if "attn2" in variant or "attn3" in variant:
            bias3 = jnp.concatenate([w["q_bias"], jnp.zeros_like(w["q_bias"]),
                                     w["v_bias"]], -1)
            if int8:
                h_q, h_s = _dyn_quant_rows(h)
                qkv = _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], bias3,
                               dtype)
            else:
                qkv = (h @ w["qkv_w"] + bias3).astype(dtype)
            # hg16: all 16 heads in ONE batched dot (f32 score tensor
            # 4.2 MB — still inside the block-set budget at rows=1)
            hg = (16 if "hg16" in variant else 8) if "attn3" in variant else 0
            att = fused_attention_flat(qkv, SCALE, HEADS, S,
                                       rows_per_cell=1 if hg else 2,
                                       head_group=hg)
        else:
            qkv = project_qkv(h, w).astype(dtype)
            att = fused_attention_flat(qkv, SCALE, HEADS, S,
                                       q_bias=w["q_bias"],
                                       v_bias=w["v_bias"])
        x = x + mm(att.astype(dtype), w, "out")
        if fences:
            x = jax.lax.optimization_barrier(x)
        h = ln_site(x, w["norm2_scale"], w["norm2_bias"])
        h = act(mm(h, w, "fc1"))
        x = x + mm(h, w, "fc2")
        if fences:
            x = jax.lax.optimization_barrier(x)
        return x, None

    def block(x, w):
        if "flat" in variant:
            assert not fq, ("fq+flat probing not wired here — measure via "
                            "bench.py's (int8, fq, v2, flat) ladder config")
            return block_flat(x, w)
        if fq:
            return block_fq(x, w)
        if "attn2" in variant or "attn3" in variant:
            return block_attn2(x, w)
        h = _ln(x, w["norm1_scale"], w["norm1_bias"], EPS)
        if variant == "barrier-ln" or fences:
            h = jax.lax.optimization_barrier(h)
        if variant == "split3":
            wq, wk, wv = jnp.split(w["qkv_w"], 3, axis=-1)
            q = (h @ wq + w["q_bias"]).astype(dtype)
            k = (h @ wk).astype(dtype)
            v = (h @ wv + w["v_bias"]).astype(dtype)
            att = fused_attention_packed(q, k, v, SCALE, HEADS)
        else:
            qkv = project_qkv(h, w)
            if variant == "noattn":
                # relu + grouped-sum keeps every qkv column live while
                # blocking XLA's slice-of-dot / add-of-dots rewrites (a
                # plain sum of thirds algebraically folds to one smaller dot)
                hd = HEADS * D
                b_, s_ = qkv.shape[:2]
                att = (jax.nn.relu(qkv).reshape(b_, s_, 3, hd).sum(2)
                       + w["q_bias"] + w["v_bias"])
            elif variant == "attn-xla":
                att = fused_attention_qkv(qkv, w["q_bias"], w["v_bias"],
                                          SCALE, HEADS, use_pallas=False)
            else:  # base, barrier-ln, fences
                if variant == "barrier-qkv":
                    qkv = jax.lax.optimization_barrier(qkv)
                att = fused_attention_qkv(qkv, w["q_bias"], w["v_bias"],
                                          SCALE, HEADS)
        att = att.astype(dtype)
        x = x + mm(att, w, "out")
        if fences:
            x = jax.lax.optimization_barrier(x)
        h = _ln(x, w["norm2_scale"], w["norm2_bias"], EPS)
        if fences:
            h = jax.lax.optimization_barrier(h)
        h = act(mm(h, w, "fc1"))
        x = x + mm(h, w, "fc2")
        if fences:
            x = jax.lax.optimization_barrier(x)
        return x, None

    def forward(x, xs):
        if "flat" in variant:
            b2 = x.shape[0]
            y, _ = jax.lax.scan(block, x.reshape(b2 * S, C), xs)
            return y.reshape(b2, S, C)
        y, _ = jax.lax.scan(block, x, xs)
        return y

    x = jnp.asarray(rng.standard_normal((batch, S, C), dtype=np.float32)
                    * 0.2, dtype)
    return forward, x, xs


def _device_ms_per_call(trace_dir: str) -> float:
    """Sum of top-level jit_forward device durations / number of calls."""
    import glob
    import gzip
    import json

    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return 0.0
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {k for k, v in pids.items() if "TPU" in v}
    tot, n = 0.0, 0
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev
                and e.get("name", "").startswith("jit_")):
            tot += e["dur"]
            n += 1
    return tot / n / 1e3 if n else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str,
                    default="base,noattn,barrier-ln,split3")
    ap.add_argument("--int8", action="store_true",
                    help="run int8 flavors of the listed variants")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hlodir", type=str, default="/tmp/blockhlo")
    ap.add_argument("--trace", type=str, default="",
                    help="variant name to trace with jax.profiler")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    os.makedirs(args.hlodir, exist_ok=True)
    print(f"# devices: {jax.devices()}", flush=True)

    for variant in args.variants.split(","):
        tag = variant + ("-int8" if args.int8 else "")
        try:
            forward, x, xs = build(variant, args.int8, args.batch,
                                   interpret=args.cpu)
            t0 = time.perf_counter()
            lowered = jax.jit(forward).lower(x, xs)
            compiled = lowered.compile()
            compile_s = time.perf_counter() - t0
            with open(os.path.join(args.hlodir, tag + ".hlo"), "w") as f:
                f.write(compiled.as_text())
            np.asarray(compiled(x, xs))  # warm
            start = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = compiled(x, xs)
            np.asarray(out)
            dt = (time.perf_counter() - start) / args.iters
            # --trace <name> restricts profiler tracing to that variant;
            # default (empty) traces every variant
            dev_ms = 0.0
            if not args.trace or args.trace == variant:
                tdir = os.path.join(args.hlodir, "trace-" + tag)
                with jax.profiler.trace(tdir):
                    for _ in range(2):
                        np.asarray(compiled(x, xs))
                dev_ms = _device_ms_per_call(tdir)
            fps = args.batch / (dev_ms / 1e3) if dev_ms else args.batch / dt
            print(f"{tag:16s} device-ms/call={dev_ms:8.1f}  "
                  f"wall-ms/call={dt * 1e3:8.1f}  fps-dev={fps:6.1f}  "
                  f"compile={compile_s:.1f}s", flush=True)
        except Exception as e:
            print(f"{tag:16s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
