"""Scan-over-layers EVA vision forward (bf16 and int8) for throughput.

The flax `EvaVisionTower` unrolls its 40 blocks into one giant HLO graph —
fine for parity work, but XLA compile time scales with graph size: the
unrolled int8 + dynamic-quant graph took >25 min to compile through the dev
tunnel (ROADMAP round-1 #3), which made the 2x-int8-peak lever unusable and
made batch-size sweeps prohibitively slow even in bf16.

This module stacks the per-block parameters along a leading [L] axis and
runs the blocks with `lax.scan`, so XLA compiles ONE block regardless of
depth. Identical math to `EvaVisionTower` (parity-tested in
tests/test_eva_scan.py); the int8 path quantizes every projection
(qkv/out/fc1/fc2 — ~97% of the FLOPs) per-output-channel at build time with
dynamic per-row activation scales, running int8 x int8 -> int32 on the MXU
(2x bf16 peak on v5e). LayerNorm / softmax / residuals stay f32/bf16.

Replaces the throughput role of reference
extraction/video_features/extract_features.py:42-68 (fp16 CUDA encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hirest_tpu.config import EvaVisionConfig
from hirest_tpu.models.layers import (gelu, gelu_bf16_poly, merge_heads,
                                       split_heads)
from hirest_tpu.ops.attention import (fused_attention, fused_attention_flat,
                                      fused_attention_qkv,
                                      fused_attention_qkv2,
                                      fused_attention_qkv3)


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _stack(blocks, *path):
    leaves = []
    for b in blocks:
        x = b
        for k in path:
            x = x[k]
        leaves.append(np.asarray(x))
    return np.stack(leaves)


def stack_block_params(params: dict, cfg: EvaVisionConfig) -> dict:
    """Per-block param dicts -> one dict of [L, ...]-stacked float arrays."""
    p = params["params"] if "params" in params else params
    blocks = [p[f"block_{i}"] for i in range(cfg.layers)]
    return {
        "norm1_scale": _stack(blocks, "norm1", "scale"),
        "norm1_bias": _stack(blocks, "norm1", "bias"),
        "norm2_scale": _stack(blocks, "norm2", "scale"),
        "norm2_bias": _stack(blocks, "norm2", "bias"),
        "qkv_w": _stack(blocks, "attn", "qkv", "kernel"),
        "q_bias": _stack(blocks, "attn", "q_bias"),
        "v_bias": _stack(blocks, "attn", "v_bias"),
        "out_w": _stack(blocks, "attn", "out", "kernel"),
        "out_b": _stack(blocks, "attn", "out", "bias"),
        "fc1_w": _stack(blocks, "mlp_fc1", "kernel"),
        "fc1_b": _stack(blocks, "mlp_fc1", "bias"),
        "fc2_w": _stack(blocks, "mlp_fc2", "kernel"),
        "fc2_b": _stack(blocks, "mlp_fc2", "bias"),
    }


def _quantize_stacked(w: np.ndarray):
    """[L, in, out] float -> ([L, in, out] int8, [L, out] f32 scales),
    per (layer, out-channel)."""
    w = np.asarray(w, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=1) / 127.0, 1e-8)  # [L, out]
    q = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def _dyn_quant_rows(x):
    """[..., in] float -> (int8 rows, [..., 1] f32 scales)."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_mm(x_q, x_s, w_q, w_s, bias, out_dtype):
    """x_q [..., in] int8, w_q [in, out] int8 -> [..., out] out_dtype
    (works for the 3D [B, N, in] and the flat 2D [B*N, in] trunk layouts)."""
    acc = jax.lax.dot_general(x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * x_s
           * w_s.reshape((1,) * (x_q.ndim - 1) + (-1,)))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def fold_uint8_frontend(patch_w: np.ndarray, patch_b: np.ndarray):
    """Fold CLIP pixel normalization ((x/255 - mean) / std, a per-channel
    affine) into the patch-embed projection, so the forward consumes RAW
    uint8 frames: x_norm @ W + b == u8 @ (W * a[:, None]) + (bvec @ W + b)
    with a_c = 1/(255*std_c), bvec_c = -mean_c/std_c. Exact in f32.

    Replaces the reference's host-side torchvision Normalize
    (EVA_clip/eva_clip.py transform) with zero device work and a 4x
    smaller host->device image transfer (uint8 vs f32)."""
    from hirest_tpu.models.eva_clip import CLIP_MEAN, CLIP_STD

    w = np.asarray(patch_w, np.float32)  # [p*p*3, width], channel-minor rows
    b = np.asarray(patch_b, np.float32)
    reps = w.shape[0] // 3
    a = np.tile(1.0 / (255.0 * CLIP_STD), reps)
    bvec = np.tile(-CLIP_MEAN / CLIP_STD, reps)
    return w * a[:, None], b + bvec @ w


def stage_scanned_params(params: dict, cfg: EvaVisionConfig,
                         *, int8: bool = False, dtype=jnp.bfloat16,
                         uint8_input: bool = False):
    """Upload the scanned-forward parameter set to the device once:
    -> (consts, xs) device trees. The same staged pair serves EVERY kernel
    configuration of the same precision (v2/flat/fused-quant differ only in
    program, not weights) — important through the ~48 MB/s axon tunnel,
    where re-staging ~2 GB per bench config would dominate wall time.

    uint8_input folds pixel normalization into the patch embed
    (fold_uint8_frontend): the returned consts expect raw 0..255 frames.

    Returns (consts, xs, meta): meta records the staging flags so
    build_scanned_vision_apply can reject a mismatched reuse — an int8
    mismatch fails loudly anyway (missing _wq keys), but a uint8_input
    mismatch would silently apply unfolded patch weights to raw 0..255
    frames and produce garbage embeddings. Meta-less 2-tuples are
    REJECTED by build_scanned_vision_apply (the guard cannot be bypassed
    by slicing the tuple)."""
    p = params["params"] if "params" in params else params
    stacked = stack_block_params(params, cfg)
    patch_w, patch_b = p["patch_embed"]["kernel"], p["patch_embed"]["bias"]
    if uint8_input:
        patch_w, patch_b = fold_uint8_frontend(patch_w, patch_b)
    consts = {
        "patch_w": jnp.asarray(patch_w, dtype),
        "patch_b": jnp.asarray(patch_b, dtype),
        "head_w": jnp.asarray(p["head"]["kernel"], dtype),
        "head_b": jnp.asarray(p["head"]["bias"], dtype),
        "cls_token": jnp.asarray(p["cls_token"], dtype),
        "pos": jnp.asarray(p["pos_embed"], dtype),
        "fnorm_scale": jnp.asarray(p["norm"]["scale"]),
        "fnorm_bias": jnp.asarray(p["norm"]["bias"]),
    }
    if int8:
        xs = {k: jnp.asarray(v, dtype) for k, v in stacked.items()
              if not k.endswith("_w")}
        for name in ("qkv", "out", "fc1", "fc2"):
            q, s = _quantize_stacked(stacked[name + "_w"])
            xs[name + "_wq"], xs[name + "_ws"] = q, s
    else:
        xs = {k: jnp.asarray(v, dtype) for k, v in stacked.items()}
    meta = {"int8": int8, "dtype": jnp.dtype(dtype).name,
            "uint8_input": uint8_input}
    return consts, xs, meta


def build_scanned_vision_apply(params: dict,
                               cfg: EvaVisionConfig = EvaVisionConfig(),
                               *, int8: bool = False, use_pallas: bool = True,
                               dtype=jnp.bfloat16, interpret: bool = False,
                               remat: bool = False, fused_quant: bool = False,
                               fast_gelu: bool = True,
                               xla_fences: bool = True,
                               attn_v2: bool = False,
                               attn_v3: bool = False,
                               attn_hg: int = 8,
                               attn_rows: int = 1,
                               flat2d: bool = False,
                               fused_ln: bool = False,
                               uint8_input: bool = False,
                               pad_tokens: bool = False,
                               fused_mlp: bool = False,
                               staged=None):
    """Build a jitted `apply(images [B, H, W, 3]) -> [B, embed_dim]` whose
    block stack runs under `lax.scan` (one-block compile time).

    params: the float EvaVisionTower tree (converted checkpoint or
    shape-init), optionally already head-padded (pad_vision_head_params).
    int8: quantize qkv/out/fc1/fc2 projections (weights per-channel at build
    time, activations per-row dynamically).
    staged: optional (consts, xs, meta) from stage_scanned_params to reuse
    an existing device upload across kernel configurations; meta must match
    this build's int8/dtype/uint8_input flags (asserted).
    uint8_input: apply() takes RAW uint8 0..255 frames; pixel normalization
    is folded into the patch embed (fold_uint8_frontend).
    """
    heads = cfg.num_heads
    head_dim = cfg.head_width
    scale = head_dim ** -0.5
    grid = cfg.image_size // cfg.patch_size
    ppc = cfg.patch_size * cfg.patch_size * 3
    eps = cfg.norm_eps
    # packed kernel needs a 128-aligned lane extent; head-groups are sized
    # by _pick_heads_per_block (full row for EVA's unpadded 16x88=1408)
    packed = use_pallas and (heads * head_dim) % 128 == 0

    # All weights travel as EXPLICIT jit arguments. Closing over them would
    # embed ~2 GB as HLO constants — compilation stalls for 10+ minutes
    # through the axon tunnel (the round-1 int8-path failure mode).
    if staged is None:
        staged = stage_scanned_params(params, cfg, int8=int8, dtype=dtype,
                                      uint8_input=uint8_input)
    consts, xs, meta = staged
    want = {"int8": int8, "dtype": jnp.dtype(dtype).name,
            "uint8_input": uint8_input}
    assert meta == want, (
        f"staged params were staged with {meta} but the forward is "
        f"being built with {want} — restage with matching flags "
        f"(a uint8_input mismatch would silently corrupt embeddings)")

    def attn_core_split(q, k, v):
        out = fused_attention(split_heads(q, heads), split_heads(k, heads),
                              split_heads(v, heads), scale,
                              use_pallas=use_pallas, interpret=interpret)
        return merge_heads(out)

    # fused LN/gelu + rowwise-quant Pallas kernels: one HBM read + an int8
    # write per site instead of XLA's separate reduce + map passes
    fq = fused_quant and int8
    if fq:
        from hirest_tpu.ops.quant import act_quant, ln_quant
    # fused_mlp: the whole fc1 -> gelu -> requant -> fc2 -> +residual chain
    # runs in one pallas call with the [., mlp_hidden] intermediate resident
    # in VMEM (ops/quant.fused_mlp_int8) — no act_quant HBM round-trip.
    fm = fused_mlp and fq
    if fm:
        from hirest_tpu.ops.quant import fused_mlp_int8
    # fused_ln: bf16-path LayerNorms run as one-read-one-write Pallas
    # kernels (ops/quant.ln_bf16) instead of XLA's reduce+normalize fusion
    # (two reads of the activation). The pallas call is itself a fusion
    # boundary, so it subsumes the LN-output fence at those sites.
    fln = fused_ln and not int8 and use_pallas
    if fln:
        from hirest_tpu.ops.quant import ln_bf16

        def _ln_b(x, s_, b_):
            return ln_bf16(x, s_, b_, eps, interpret=interpret,
                           row_block=n_tokens if x.ndim == 2 else None)

    # fast_gelu: bf16-accurate short erf polynomial (see gelu_bf16_poly) —
    # the exact-erf epilogue XLA emits costs ~60 ms/call on the full trunk.
    act_fn = gelu_bf16_poly if fast_gelu else gelu
    # xla_fences: optimization_barrier after each residual add AND each
    # LayerNorm output. Residual fences stop the next LN's row-mean reduce
    # being epilogue-fused into the dot fusion (measured: out-proj fusion
    # 42.7 -> 28.7 ms/call; the reduce serializes the dot's N-tiles).
    # LN-output fences stop the normalize chain being PRODUCER-fused into
    # the following qkv/fc1 dot, where it recomputes per output tile
    # (measured: fc1 dot fusion 188 ms @ 61.5% MFU with the fusion; the
    # full fence set took the bf16 block stack 525.7 -> 459.3 ms/call).
    # Identity math either way.
    fence = jax.lax.optimization_barrier if xla_fences else (lambda v: v)

    # flat2d: the trunk runs as [B*S, C] — a 2D dot emits a plain {1,0}
    # layout, sidestepping the 3D batch-in-sublanes layout negotiation that
    # costs the [B, S, C] qkv matmul ~13% MFU against the pallas operand's
    # forced {2,1,0} (reshapes at the jit boundary are bitcasts).
    # pad_tokens: pad the token axis 257 -> 264 (next multiple of 8) with
    # zero rows so every per-image [S, C] face is sublane-aligned. Without
    # it the flat trunk's [B*S, C] <-> [B, S, C] reshapes around the
    # attention kernel are REAL relayout copies (XLA pads each face to 264
    # sublanes internally: measured 60.8 ms/call of pure data movement on
    # the int8+fq+v3+flat winner, tools/model_probe.py 2026-08-19), and the
    # 3D trunk's dots pay the same padding inside every layout negotiation.
    # Pad keys are masked to exactly-zero attention weight in the lean
    # kernels (n_real), so token outputs are bit-identical; costs +2.7%
    # projection rows. Requires the lean kernels (v2/v3).
    n_real = grid * grid + 1
    n_tokens = (n_real + 7) // 8 * 8 if pad_tokens else n_real
    tok_pad = n_tokens - n_real
    if pad_tokens:
        assert (attn_v2 or attn_v3) and packed, \
            "pad_tokens requires the lean v2/v3 kernels (key masking)"
    mask_real = n_real if pad_tokens else 0
    if flat2d:
        assert packed, "flat2d needs the pallas flat kernel"

    # The 3D and flat blocks share everything except the attention dispatch;
    # the two halves below are the single source of fence/quantization
    # semantics for BOTH trunk layouts (ln_quant/act_quant ignore row_block
    # on 3D inputs, so it is passed unconditionally).

    def _ln1_qkv(x, w, qkv_bias):
        """LN1 (fenced) -> qkv projection, optional pre-added [3HD] bias."""
        if fq:
            h_q, h_s = ln_quant(x, w["norm1_scale"], w["norm1_bias"], eps,
                                interpret=interpret, row_block=n_tokens)
            return _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], qkv_bias,
                            dtype)
        h = (_ln_b(x, w["norm1_scale"], w["norm1_bias"]) if fln
             else fence(_ln(x, w["norm1_scale"], w["norm1_bias"], eps)))
        if int8:
            h_q, h_s = _dyn_quant_rows(h)
            return _int8_mm(h_q, h_s, w["qkv_wq"], w["qkv_ws"], qkv_bias,
                            dtype)
        qkv = h @ w["qkv_w"]
        return qkv + qkv_bias if qkv_bias is not None else qkv

    def _out_mlp(x, w, att=None, a_qs=None):
        """out-projection residual + LN2 + MLP residual. Attention arrives
        either as a dense tensor (att) or already-quantized codes+scales
        (a_qs, from a kernel quant epilogue)."""
        if fq:
            if a_qs is None:
                a_qs = act_quant(att.astype(dtype), interpret=interpret,
                                 row_block=n_tokens)
            x = fence(x + _int8_mm(*a_qs, w["out_wq"], w["out_ws"],
                                   w["out_b"], dtype))
            h_q, h_s = ln_quant(x, w["norm2_scale"], w["norm2_bias"], eps,
                                interpret=interpret, row_block=n_tokens)
            gact = "gelu_poly" if fast_gelu else "gelu"
            if fm:
                return fence(fused_mlp_int8(
                    h_q, h_s, w["fc1_wq"], w["fc1_ws"], w["fc1_b"],
                    w["fc2_wq"], w["fc2_ws"], w["fc2_b"], x, act=gact,
                    row_block=n_tokens, interpret=interpret))
            h = _int8_mm(h_q, h_s, w["fc1_wq"], w["fc1_ws"], w["fc1_b"],
                         dtype)
            h_q, h_s = act_quant(h, act=gact,
                                 interpret=interpret, row_block=n_tokens)
            return fence(x + _int8_mm(h_q, h_s, w["fc2_wq"], w["fc2_ws"],
                                      w["fc2_b"], dtype))
        if int8:
            a_q, a_s = _dyn_quant_rows(att.astype(dtype))
            x = fence(x + _int8_mm(a_q, a_s, w["out_wq"], w["out_ws"],
                                   w["out_b"], dtype))
            h = fence(_ln(x, w["norm2_scale"], w["norm2_bias"], eps))
            h_q, h_s = _dyn_quant_rows(h)
            h = act_fn(_int8_mm(h_q, h_s, w["fc1_wq"], w["fc1_ws"],
                                w["fc1_b"], dtype))
            h_q, h_s = _dyn_quant_rows(h)
            return fence(x + _int8_mm(h_q, h_s, w["fc2_wq"], w["fc2_ws"],
                                      w["fc2_b"], dtype))
        x = fence(x + (att.astype(dtype) @ w["out_w"] + w["out_b"]))
        h = (_ln_b(x, w["norm2_scale"], w["norm2_bias"]) if fln
             else fence(_ln(x, w["norm2_scale"], w["norm2_bias"], eps)))
        h = act_fn(h @ w["fc1_w"] + w["fc1_b"])
        return fence(x + (h @ w["fc2_w"] + w["fc2_b"]))

    def _bias3(w):
        return jnp.concatenate([w["q_bias"], jnp.zeros_like(w["q_bias"]),
                                w["v_bias"]], -1)

    def block_flat(x, w):
        lean = attn_v2 or attn_v3  # lean kernels need pre-added biases
        hg = attn_hg if attn_v3 else 0  # v3: heads per batched dot
        qkv = _ln1_qkv(x, w, _bias3(w) if lean else None)
        if lean and fq:
            a_qs = fused_attention_flat(qkv.astype(dtype), scale, heads,
                                        n_tokens, interpret=interpret,
                                        quant_out=True, head_group=hg,
                                        rows_per_cell=attn_rows,
                                        n_real=mask_real)
            return _out_mlp(x, w, a_qs=a_qs), None
        if lean:
            att = fused_attention_flat(qkv.astype(dtype), scale, heads,
                                       n_tokens,
                                       rows_per_cell=1 if attn_v3 else 2,
                                       interpret=interpret, head_group=hg,
                                       n_real=mask_real)
        else:
            att = fused_attention_flat(qkv.astype(dtype), scale, heads,
                                       n_tokens, q_bias=w["q_bias"],
                                       v_bias=w["v_bias"],
                                       interpret=interpret)
        return _out_mlp(x, w, att=att), None

    def block(x, w):
        if flat2d:
            return block_flat(x, w)
        # attn_v2/v3 pre-fold the q/v biases into the qkv projection's
        # epilogue (a free broadcast add in the dot fusion), so the lean
        # kernels receive bias-complete rows
        # interpret only changes HOW kernels run (interpret vs compiled),
        # never WHICH path is selected — a CPU interpret smoke must
        # exercise exactly the dispatch the chip will take
        v3 = attn_v3 and packed
        v2 = attn_v2 and packed and not v3
        qkv = _ln1_qkv(x, w, _bias3(w) if (v2 or v3) else None)
        if (v2 or v3) and fq:
            if v3:
                a_qs = fused_attention_qkv3(qkv.astype(dtype), scale, heads,
                                            head_group=attn_hg,
                                            interpret=interpret,
                                            quant_out=True,
                                            n_real=mask_real)
            else:
                a_qs = fused_attention_qkv2(qkv.astype(dtype), scale, heads,
                                            interpret=interpret,
                                            quant_out=True,
                                            n_real=mask_real)
            return _out_mlp(x, w, a_qs=a_qs), None
        if v3:
            att = fused_attention_qkv3(qkv.astype(dtype), scale, heads,
                                       head_group=attn_hg,
                                       interpret=interpret,
                                       n_real=mask_real)
        elif v2:
            att = fused_attention_qkv2(qkv.astype(dtype), scale, heads,
                                       interpret=interpret,
                                       n_real=mask_real)
        elif packed and fq:
            # attention with the quant epilogue: int8 codes + row scales
            # come straight out of the kernel (no bf16 HBM round-trip)
            a_qs = fused_attention_qkv(qkv, w["q_bias"], w["v_bias"],
                                       scale, heads, interpret=interpret,
                                       quant_out=True)
            return _out_mlp(x, w, a_qs=a_qs), None
        elif packed:
            # fused-qkv kernel: q/k/v thirds and per-head columns sliced
            # in VMEM, q/v biases added in-kernel — no split copies
            att = fused_attention_qkv(qkv, w["q_bias"], w["v_bias"], scale,
                                      heads, interpret=interpret)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            att = attn_core_split(q + w["q_bias"], k, v + w["v_bias"])
        return _out_mlp(x, w, att=att), None

    body = jax.checkpoint(lambda x, w: block(x, w)) if remat else block

    def forward(c, xs, images):
        bsz = images.shape[0]
        x = images.astype(dtype).reshape(bsz, grid, cfg.patch_size, grid,
                                         cfg.patch_size, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, grid * grid, ppc)
        x = x @ c["patch_w"] + c["patch_b"]
        x = jnp.concatenate(
            [jnp.broadcast_to(c["cls_token"], (bsz, 1, cfg.width)), x], 1)
        x = x + c["pos"]
        if tok_pad:
            x = jnp.pad(x, ((0, 0), (0, tok_pad), (0, 0)))
        if flat2d:
            x = x.reshape(bsz * n_tokens, cfg.width)
        x, _ = jax.lax.scan(body, x, xs)
        if flat2d:
            x = x.reshape(bsz, n_tokens, cfg.width)
        x = _ln(x, c["fnorm_scale"], c["fnorm_bias"], eps)
        return (x[:, 0] @ c["head_w"] + c["head_b"]).astype(jnp.float32)

    jitted = jax.jit(forward)
    return lambda images: jitted(consts, xs, images)
