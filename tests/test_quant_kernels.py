"""Parity tests for the fused rowwise quantization kernels (ops/quant.py).

ln_quant / act_quant fuse LayerNorm / exact-erf GELU with dynamic per-row
int8 quantization in one Pallas pass; they must reproduce the unfused
_ln + _dyn_quant_rows composition (models/eva_scan.py) up to one
quantization bin (the fused path skips the bf16 round-trip between the
producer and the quantizer, so exact bit equality is not expected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hirest_tpu.config import EvaVisionConfig
from hirest_tpu.models.eva_scan import (_dyn_quant_rows, _ln,
                                        build_scanned_vision_apply)
from hirest_tpu.models.layers import gelu
from hirest_tpu.ops.quant import act_quant, ln_quant

EPS = 1e-6


def _dequant(q, s):
    return np.asarray(q, np.float32) * np.asarray(s, np.float32)


@pytest.mark.parametrize("shape", [(2, 7, 256), (1, 33, 384)])
def test_ln_quant_matches_unfused(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 2.0, jnp.float32)
    g = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) * 0.5 + 1.0)
    b = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) * 0.1)

    q, s = ln_quant(x, g, b, EPS, interpret=True)
    assert q.dtype == jnp.int8 and s.shape == shape[:2] + (1,)

    ref = np.asarray(_ln(x, g, b, EPS))
    got = _dequant(q, s)
    # one quantization bin = s per element
    assert np.all(np.abs(got - ref) <= np.asarray(s) + 1e-6)
    # and the int8 codes match the reference quantizer almost everywhere
    q_ref, s_ref = _dyn_quant_rows(jnp.asarray(ref))
    match = np.mean(np.asarray(q) == np.asarray(q_ref))
    assert match > 0.99, match


@pytest.mark.parametrize("shape", [(66, 256), (2, 33, 384)])
def test_ln_bf16_matches_ln(shape):
    """ln_bf16 (one-pass bf16 LayerNorm kernel) must match eva_scan._ln:
    same f32 mean/var/rsqrt math, same final cast (reduction order may
    differ between the XLA fusion and the interpret-mode kernel, so exact
    bit equality is not asserted)."""
    from hirest_tpu.ops.quant import ln_bf16

    rng = np.random.default_rng(7)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=shape) * 2.0, dtype)
        g = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) + 1.0)
        b = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) * 0.1)
        ref = np.asarray(_ln(x, g, b, EPS), dtype=np.float32)
        got = ln_bf16(x, g, b, EPS, interpret=True,
                      row_block=33 if len(shape) == 2 else None)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32), ref,
                                   rtol=2e-6, atol=2e-6)


def test_act_quant_gelu_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 256)) * 3.0, jnp.bfloat16)

    q, s = act_quant(x, act="gelu", interpret=True)
    ref = np.asarray(gelu(x.astype(jnp.float32)))
    got = _dequant(q, s)
    assert np.all(np.abs(got - ref) <= np.asarray(s) + 1e-6)


def test_act_quant_identity_matches_dyn_quant_rows():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 5, 128)), jnp.float32)
    q, s = act_quant(x, interpret=True)
    q_ref, s_ref = _dyn_quant_rows(x)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_scanned_int8_fused_quant_matches_unfused():
    """End-to-end: the fused-quant scan forward tracks the unfused int8
    scan closely (same quantization granularity, no bf16 round-trip)."""
    tiny = EvaVisionConfig(image_size=28, layers=3, width=64, head_width=16,
                           mlp_ratio=4.0, patch_size=14, embed_dim=32)
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.utils.init import shape_only_init

    tower = EvaVisionTower(tiny, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])

    base = build_scanned_vision_apply(params, tiny, int8=True,
                                      use_pallas=False, dtype=jnp.bfloat16)
    fused = build_scanned_vision_apply(params, tiny, int8=True,
                                       use_pallas=False, dtype=jnp.bfloat16,
                                       fused_quant=True, interpret=True)
    a = np.asarray(base(imgs))
    b = np.asarray(fused(imgs))
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1))
    assert np.all(cos > 0.995), cos


def test_attention_quant_epilogue_matches_plain_kernel():
    """fused_attention_qkv(quant_out=True) must dequantize to the plain
    kernel's output within one quantization bin, with row scales over the
    full H*D row (matching _dyn_quant_rows granularity)."""
    from hirest_tpu.ops.attention import fused_attention_qkv

    rng = np.random.default_rng(4)
    b, s, heads, d = 2, 9, 4, 16
    hd = heads * d
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * hd)), jnp.float32)
    qb = jnp.asarray(rng.normal(size=hd), jnp.float32)
    vb = jnp.asarray(rng.normal(size=hd), jnp.float32)
    scale = d ** -0.5

    att = np.asarray(fused_attention_qkv(qkv, qb, vb, scale, heads,
                                         interpret=True))
    q, sc = fused_attention_qkv(qkv, qb, vb, scale, heads, interpret=True,
                                quant_out=True)
    assert q.dtype == jnp.int8 and sc.shape == (b, s, 1)
    got = _dequant(q, sc)
    assert np.all(np.abs(got - att) <= np.asarray(sc) + 1e-5)


def test_gelu_bf16_poly_accuracy_bounds():
    """gelu_bf16_poly's documented bounds: absolute error <= 1.6e-3
    everywhere, and <= 2 bf16 ULP wherever |gelu(x)| >= 0.1 (it replaces
    the exact form only where results are consumed in bf16/int8)."""
    from hirest_tpu.models.layers import gelu_bf16_poly

    x = jnp.asarray(np.linspace(-12, 12, 200001), jnp.float32)
    exact = np.asarray(gelu(x))
    approx = np.asarray(gelu_bf16_poly(x))
    err = np.abs(approx - exact)
    assert err.max() <= 1.6e-3, err.max()
    big = np.abs(exact) >= 0.1
    ulp = np.abs(exact[big]) * 2.0 ** -8
    assert np.max(err[big] / ulp) <= 2.0


def test_attention_qkv2_matches_v1():
    """fused_attention_qkv2 (biases pre-added, exp2 softmax, folded
    normalizer) must match the v1 fused-qkv kernel numerically."""
    from hirest_tpu.ops.attention import (fused_attention_qkv,
                                          fused_attention_qkv2)

    rng = np.random.default_rng(5)
    b, s, heads, d = 4, 9, 4, 16
    hd = heads * d
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * hd)), jnp.float32)
    qb = jnp.asarray(rng.normal(size=hd), jnp.float32)
    vb = jnp.asarray(rng.normal(size=hd), jnp.float32)
    scale = d ** -0.5

    ref = np.asarray(fused_attention_qkv(qkv, qb, vb, scale, heads,
                                         interpret=True))
    bias3 = jnp.concatenate([qb, jnp.zeros_like(qb), vb])
    got = np.asarray(fused_attention_qkv2(qkv + bias3, scale, heads,
                                          interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # odd batch -> rows_per_cell falls back to 1
    got1 = np.asarray(fused_attention_qkv2((qkv + bias3)[:3], scale, heads,
                                           interpret=True))
    np.testing.assert_allclose(got1, ref[:3], rtol=2e-5, atol=2e-5)


def test_attention_qkv2_quant_epilogue():
    """v2 kernel quant epilogue: dequantizes to the unquantized v2 output
    within one bin; also via the scanned forward (fq + attn_v2)."""
    from hirest_tpu.ops.attention import fused_attention_qkv2

    rng = np.random.default_rng(6)
    b, s, heads, d = 4, 9, 4, 32
    hd = heads * d
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * hd)), jnp.float32)
    scale = d ** -0.5
    ref = np.asarray(fused_attention_qkv2(qkv, scale, heads, interpret=True))
    q, sc = fused_attention_qkv2(qkv, scale, heads, interpret=True,
                                 quant_out=True)
    assert q.dtype == jnp.int8
    got = _dequant(q, sc)
    assert np.all(np.abs(got - ref) <= np.asarray(sc) + 1e-5)

    tiny = EvaVisionConfig(image_size=28, layers=2, width=128, head_width=32,
                           mlp_ratio=4.0, patch_size=14, embed_dim=32)
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.utils.init import shape_only_init

    tower = EvaVisionTower(tiny, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    a = np.asarray(build_scanned_vision_apply(
        params, tiny, int8=True, use_pallas=True, dtype=jnp.bfloat16,
        fused_quant=True, interpret=True)(imgs))
    b2 = np.asarray(build_scanned_vision_apply(
        params, tiny, int8=True, use_pallas=True, dtype=jnp.bfloat16,
        fused_quant=True, attn_v2=True, interpret=True)(imgs))
    cos = np.sum(a * b2, -1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b2, axis=-1))
    assert np.all(cos > 0.995), cos
