"""Weight-only-calibrated int8 matmul path for the frozen towers.

v5e's MXU has 2x int8 peak vs bf16. For the frozen EVA encoder (a feature
extractor, no training), the MLP up/down projections — ~2/3 of the FLOPs —
can run as int8 x int8 -> int32 with per-channel weight scales and dynamic
per-row activation scales. Attention stays bf16 (small fraction of FLOPs,
higher sensitivity).

This is an opt-in throughput mode (`quantize="int8"` on the tower /
`--int8` on the bench); parity-sensitive paths default to bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """[in, out] float weight -> (int8 weight, [out] float scales).

    Computed host-side in NumPy: doing this with jnp ops would dispatch one
    device program per weight matrix (~80 for the EVA tower) at build time.
    """
    import numpy as np

    w = np.asarray(w, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=0) / 127.0, 1e-8)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: jnp.ndarray | None = None, out_dtype=jnp.bfloat16):
    """x [..., in] float -> [..., out], computed int8 x int8 -> int32 on the
    MXU with dynamic per-row activation quantization."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-8)
    x_q = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype).reshape(shape[:-1] + (w_q.shape[1],))


class QuantDense:
    """Stateless int8 replacement for a converted Dense layer: built from a
    float param dict {'kernel', 'bias'?}, callable on activations."""

    def __init__(self, params: dict, out_dtype=jnp.bfloat16):
        self.w_q, self.w_scale = quantize_weight(jnp.asarray(params["kernel"]))
        self.bias = (jnp.asarray(params["bias"]) if "bias" in params else None)
        self.out_dtype = out_dtype

    def __call__(self, x):
        return int8_matmul(x, self.w_q, self.w_scale, self.bias, self.out_dtype)
