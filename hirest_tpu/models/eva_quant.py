"""int8 inference path for the frozen EVA vision tower.

A functional (non-flax) forward over the converted parameter tree with the
big matmuls — the MLP up/down projections and optionally the qkv/out
projections — running int8 x int8 -> int32 on the MXU (2x bf16 peak on
v5e). Weights are quantized once per channel at build time; activations
quantize dynamically per row. LayerNorms, softmax, and residuals stay
bf16/f32. Attention cores go through the Pallas fused kernel.

Throughput mode for feature extraction / retrieval indexing; the bf16 flax
tower remains the parity path.

STATUS: numerically validated (cosine > 0.99 vs float on the test config)
but currently impractical on the tunneled dev chip — XLA compiles the
40-layer int8 + dynamic-quant graph for >25 minutes there. Revisit with a
direct-attached chip / persistent compile cache (ROADMAP.md #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hirest_tpu.config import EvaVisionConfig
from hirest_tpu.models.layers import gelu, split_heads, merge_heads
from hirest_tpu.ops.attention import fused_attention
from hirest_tpu.ops.quant import QuantDense


def _ln(x, p, eps):
    # one shared f32 LayerNorm implementation (eva_scan._ln) — a numerics
    # fix must not have to land in multiple copies
    from hirest_tpu.models.eva_scan import _ln as _ln_core

    return _ln_core(x, jnp.asarray(p["scale"]), jnp.asarray(p["bias"]), eps)


def build_int8_vision_apply(params: dict, cfg: EvaVisionConfig = EvaVisionConfig(),
                            use_pallas: bool = True, quant_attention: bool = True,
                            dtype=jnp.bfloat16):
    """params: the float EvaVisionTower params['params'] tree (converted or
    shape-init). Returns a jitted `apply(images [B,H,W,3]) -> [B, 1024]`."""
    p = params["params"] if "params" in params else params

    patch = QuantDense(p["patch_embed"], dtype)
    head = QuantDense(p["head"], dtype)
    cls_token = jnp.asarray(p["cls_token"], dtype)
    pos = jnp.asarray(p["pos_embed"], dtype)

    blocks = []
    for i in range(cfg.layers):
        b = p[f"block_{i}"]
        blk = {
            "norm1": b["norm1"], "norm2": b["norm2"],
            "q_bias": jnp.asarray(b["attn"]["q_bias"], dtype),
            "v_bias": jnp.asarray(b["attn"]["v_bias"], dtype),
            "fc1": QuantDense(b["mlp_fc1"], dtype),
            "fc2": QuantDense(b["mlp_fc2"], dtype),
        }
        if quant_attention:
            blk["qkv"] = QuantDense({"kernel": b["attn"]["qkv"]["kernel"]}, dtype)
            blk["out"] = QuantDense(b["attn"]["out"], dtype)
        else:
            blk["qkv_w"] = jnp.asarray(b["attn"]["qkv"]["kernel"], dtype)
            blk["out_w"] = jnp.asarray(b["attn"]["out"]["kernel"], dtype)
            blk["out_b"] = jnp.asarray(b["attn"]["out"]["bias"], dtype)
        blocks.append(blk)

    heads, hd = cfg.num_heads, cfg.head_width
    inner = heads * hd
    scale = hd ** -0.5
    grid = cfg.image_size // cfg.patch_size
    ppc = cfg.patch_size * cfg.patch_size * 3

    def apply(images):
        bsz = images.shape[0]
        x = images.astype(dtype).reshape(bsz, grid, cfg.patch_size, grid,
                                         cfg.patch_size, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, grid * grid, ppc)
        x = patch(x)
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (bsz, 1, cfg.width)), x], 1)
        x = x + pos

        for blk in blocks:
            h = _ln(x, blk["norm1"], cfg.norm_eps)
            if quant_attention:
                qkv = blk["qkv"](h)
            else:
                qkv = h @ blk["qkv_w"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q + blk["q_bias"]
            v = v + blk["v_bias"]
            att = fused_attention(split_heads(q, heads), split_heads(k, heads),
                                  split_heads(v, heads), scale,
                                  use_pallas=use_pallas)
            att = merge_heads(att).astype(dtype)
            if quant_attention:
                x = x + blk["out"](att)
            else:
                x = x + (att @ blk["out_w"] + blk["out_b"])
            h = _ln(x, blk["norm2"], cfg.norm_eps)
            x = x + blk["fc2"](gelu(blk["fc1"](h)))

        x = _ln(x, p["norm"], cfg.norm_eps)
        return head(x[:, 0]).astype(jnp.float32)

    return jax.jit(apply)
