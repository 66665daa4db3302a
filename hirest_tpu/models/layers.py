"""Shared transformer building blocks (flax linen).

Conventions:
- All matmuls set the activation dtype via the module's `dtype` field
  (bfloat16 for the frozen towers on TPU, float32 for trainable parts);
  parameters are always stored float32.
- GELU is the exact erf form everywhere: both torch's default nn.GELU (EVA
  towers) and the caption stack's hand-written erf gelu
  (clip4caption/modules/until_module.py:27-33) are erf-based, while flax's
  default is the tanh approximation — so `approximate=False` is load-bearing
  for weight-conversion parity.
- Attention is computed with einsum in [B, H, T, D] layout; masks are
  additive float biases broadcast to [B, 1, Tq, Tk] (the reference's
  `(1 - mask) * -10000` convention is produced by `additive_mask`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu(x):
    return nn.gelu(x, approximate=False)


# Minimax fit of erf(u)/u as an even polynomial in u^2 on u in [0, 2.9]
# (chebfit deg 6; max |erf error| 1.5e-3). Used by gelu_bf16_poly.
GELU_ERF_COEF = (1.128166641, -0.3732706075, 0.1064506995, -0.02129873868,
                 0.002738415506, -0.0001988900883, 6.119205364e-06)


def gelu_bf16_poly(x):
    """Exact-erf GELU to bf16 accuracy at ~1/3 the VPU cost.

    XLA lowers erf/erfc to a ~30-op branchy f32 polynomial tuned for f32
    accuracy; measured on the EVA trunk it costs ~60 ms/call as the fc1
    epilogue (tools/block_probe.py HLO+trace attribution). When the result
    is consumed in bfloat16 (8 mantissa bits) or quantized to int8, a short
    minimax polynomial is indistinguishable in practice: absolute error
    <= 1.6e-3 everywhere (the worst case is the x ~ -3.9 tail where
    gelu ~ -1.5e-4 and 1+erf cancels), <= 2 bf16 ULP wherever
    |gelu(x)| >= 0.1, and identical bf16 bits for ~73% of a [-12,12]
    sweep. That error is far below the int8 path's per-row quantization
    bin and of the same order as bf16 matmul rounding itself. Keeps the
    14-op chain clip/mul/6xFMA/mul/clip/mul/add/mul, all VPU-friendly f32.
    Opt out with fast_gelu=False where exact-erf bits are required.
    """
    x32 = x.astype(jnp.float32)
    u = jnp.clip(x32, -4.1, 4.1) * 0.7071067811865476
    s = u * u
    p = jnp.full_like(s, GELU_ERF_COEF[-1])
    for c in GELU_ERF_COEF[-2::-1]:
        p = p * s + c
    e = jnp.clip(u * p, -1.0, 1.0)
    return (0.5 * x32 * (1.0 + e)).astype(x.dtype)


def quick_gelu(x):
    """OpenAI CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {"gelu": gelu, "quick_gelu": quick_gelu}


def additive_mask(mask: jnp.ndarray, dtype=jnp.float32, neg: float = -10000.0) -> jnp.ndarray:
    """[B, Tk] {0,1} mask -> [B, 1, 1, Tk] additive bias ((1-m) * neg)."""
    return ((1.0 - mask.astype(dtype)) * neg)[:, None, None, :]


def causal_mask(length: int, dtype=jnp.float32, neg: float = float("-inf")) -> jnp.ndarray:
    """[1, 1, T, T] additive causal bias (upper triangle = neg)."""
    tri = jnp.triu(jnp.full((length, length), neg, dtype=dtype), k=1)
    return tri[None, None, :, :]


def dot_product_attention(q, k, v, bias: Optional[jnp.ndarray], scale: float,
                          dtype=jnp.float32):
    """q,k,v: [B, H, T, D]. bias: broadcastable to [B, H, Tq, Tk] or None.

    Softmax is always accumulated in float32 for stability, result cast back.
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


class MultiHeadAttention(nn.Module):
    """Standard joint-QKV attention with separate projections.

    Covers both the BERT-style blocks (separate q/k/v Linear, all biased)
    and, via `qkv_mode`, the EVA ViT variant (fused qkv weight with q/v-only
    bias, reference EVA_clip/vit_model.py:66-150) and the torch
    nn.MultiheadAttention packing used by the EVA text tower.
    """

    num_heads: int
    head_dim: Optional[int] = None       # override when dim != heads * head_dim slots
    out_dim: Optional[int] = None
    qkv_mode: str = "separate"           # "separate" | "fused" | "fused_qv_bias"
    use_out_proj: bool = True            # BERT-style blocks project in their
                                         # residual "output" sublayer instead
    use_pallas: bool = False             # VMEM-fused attention kernel (TPU)
    interpret: bool = False              # run pallas kernels in interpret
                                         # mode (CPU testing of the
                                         # use_pallas tower; never changes
                                         # WHICH path is selected)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in=None, bias=None):
        kv_in = q_in if kv_in is None else kv_in
        dim = q_in.shape[-1]
        head_dim = self.head_dim or dim // self.num_heads
        inner = self.num_heads * head_dim
        out_dim = self.out_dim or dim
        scale = head_dim ** -0.5
        dense = lambda feats, name, use_bias=True: nn.Dense(  # noqa: E731
            feats, name=name, use_bias=use_bias, dtype=self.dtype)

        if self.qkv_mode == "separate":
            q = dense(inner, "query")(q_in)
            k = dense(inner, "key")(kv_in)
            v = dense(inner, "value")(kv_in)
        elif self.qkv_mode in ("fused", "fused_qv_bias"):
            qkv = dense(3 * inner, "qkv", use_bias=False)(q_in)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if self.qkv_mode == "fused_qv_bias":
                q_bias = self.param("q_bias", nn.initializers.zeros, (inner,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (inner,))
                q = q + q_bias.astype(self.dtype)
                v = v + v_bias.astype(self.dtype)
            else:
                in_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * inner,))
                qb, kb, vb = jnp.split(in_bias.astype(self.dtype), 3)
                q, k, v = q + qb, k + kb, v + vb
        else:
            raise ValueError(self.qkv_mode)

        if self.use_pallas and bias is None and head_dim % 128 == 0:
            # packed-layout kernel: heads sliced in the grid, no transposes.
            # Mosaic can only block the lane dim at 128-multiples, so this
            # path needs aligned head widths.
            from hirest_tpu.ops.attention import fused_attention_packed

            out = fused_attention_packed(
                q, k, v, scale, self.num_heads,
                interpret=self.interpret).astype(self.dtype)
        elif self.use_pallas and bias is None:
            from hirest_tpu.ops.attention import fused_attention

            q = split_heads(q, self.num_heads)
            k = split_heads(k, self.num_heads)
            v = split_heads(v, self.num_heads)
            out = merge_heads(fused_attention(
                q, k, v, scale, interpret=self.interpret).astype(self.dtype))
        else:
            q = split_heads(q, self.num_heads)
            k = split_heads(k, self.num_heads)
            v = split_heads(v, self.num_heads)
            out = dot_product_attention(q, k, v, bias, scale, dtype=self.dtype)
            out = merge_heads(out)
        if not self.use_out_proj:
            return out
        return dense(out_dim, "out")(out)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, name="fc1", dtype=self.dtype)(x)
        x = gelu(x)
        return nn.Dense(out_dim, name="fc2", dtype=self.dtype)(x)
