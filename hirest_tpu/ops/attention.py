"""Pallas fused attention for the EVA ViT hot path.

The EVA-CLIP-g vision tower runs 40 layers of attention over
[B, 16 heads, 257 tokens, 88 head-dim] — small sequences, awkward dims.
The kernel computes one (batch, head) attention in a single VMEM-resident
fusion: scores + softmax + weighted sum never round-trip to HBM
( vs. XLA materializing [B, H, S, S] score tensors between fusions).

Layout strategy: callers pad head_dim 88 -> 128 (lane width) and the token
axis to a sublane multiple; in-kernel masking handles the padded keys, and
padded query rows are sliced off outside. All matmuls accumulate f32 on the
MXU (`preferred_element_type`), softmax in f32, output cast back.

`fused_attention` dispatches to the Pallas kernel on TPU and to a plain
XLA implementation elsewhere (CPU tests use interpret mode explicitly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch*head) slice: q,k,v [1, S, D] -> o [1, S, D].

    No explicit padding: Mosaic pads the VMEM tiles internally, so the
    unpadded HBM layout is read directly — padding on the host would
    materialize +45% HBM traffic for the ViT-g head width of 88."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale: float, interpret: bool = False):
    """q,k,v: [B, H, S, D] -> [B, H, S, D]."""
    b, h, s, d = q.shape
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)

    kernel = functools.partial(_attn_kernel, scale=scale)
    spec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM if pltpu else None)
    s_pad, d_pad = _round_up(s, 16), _round_up(d, 128)
    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (s_pad * s_pad * d_pad * 2),
            bytes_accessed=4 * bh * s * d * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


def _pallas_attention_packed(q, k, v, scale: float, num_heads: int,
                             interpret: bool = False):
    """Packed-layout attention: q,k,v [B, S, H*D] -> [B, S, H*D].

    Heads are sliced inside the grid via the BlockSpec index map, so the
    [B,S,H*D] -> [B,H,S,D] transposes (two full-tensor HBM round-trips per
    layer) never materialize."""
    b, s, hd = q.shape
    d = hd // num_heads

    kernel = functools.partial(_attn_kernel, scale=scale)
    spec = pl.BlockSpec((1, s, d), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM if pltpu else None)
    s_pad, d_pad = _round_up(s, 16), _round_up(d, 128)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_heads),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * (s_pad * s_pad * d_pad * 2),
            bytes_accessed=4 * b * s * hd * q.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
    )(q, k, v)
    return out


def fused_attention_packed(q, k, v, scale: float, num_heads: int,
                           use_pallas: bool = True, interpret: bool = False):
    """Attention over packed [B, S, H*D] tensors (no head transpose)."""
    if use_pallas:
        return _pallas_attention_packed(q, k, v, scale, num_heads,
                                        interpret=interpret)
    b, s, hd = q.shape
    d = hd // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    out = _xla_attention(split(q), split(k), split(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd)


def _xla_attention(q, k, v, scale: float):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def fused_attention(q, k, v, scale: float, use_pallas: bool = True,
                    interpret: bool = False):
    """Full (non-masked) attention over [B, H, S, D] tensors.

    use_pallas selects the VMEM-fused kernel (TPU); otherwise plain XLA.
    """
    if use_pallas:
        return _pallas_attention(q, k, v, scale, interpret=interpret)
    return _xla_attention(q, k, v, scale)
