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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    """One (batch*head) slice: q,k,v [S_pad, D_pad] -> o [S_pad, D_pad]."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    # mask padded keys
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(key_ids < valid_len, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale: float, interpret: bool = False):
    """q,k,v: [B, H, S, D] -> [B, H, S, D]."""
    b, h, s, d = q.shape
    s_pad = _round_up(s, 16)
    d_pad = _round_up(d, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bh = b * h
    qp = qp.reshape(bh, s_pad, d_pad)
    kp = kp.reshape(bh, s_pad, d_pad)
    vp = vp.reshape(bh, s_pad, d_pad)

    kernel = functools.partial(_attn_kernel, scale=scale, valid_len=s)
    spec = pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM if pltpu else None)
    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (s_pad * s_pad * d_pad * 2),
            bytes_accessed=4 * bh * s_pad * d_pad * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, s_pad, d_pad)[:, :, :s, :d]


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
