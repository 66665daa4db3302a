"""Static TPU-lowering checks for every production Pallas kernel.

Round-5 lesson: CPU interpret mode does NOT enforce Mosaic's tiling rules,
so three rounds of interpret-parity-tested flat-layout kernels turned out
to be unlowerable on real hardware (block rows 257/514 of a 32896-row
array violate the 8-sublane divisibility rule — every flat2d/lnk/fq ladder
config died at compile time on-chip, 2026-08-18 queue logs).

`jax.jit(f).trace(x).lower(lowering_platforms=("tpu",))` runs the Mosaic
TPU lowering pass on any host, no chip needed, and raises the exact
ValueError the chip would. These tests lower each kernel entry point at
the PRODUCTION shapes (EVA-g: B=128, S=257, H*D=1408, heads=16) so a
block-shape regression fails in the default suite, not three rounds later
on the first healthy tunnel day.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from hirest_tpu.ops.attention import (fused_attention, fused_attention_flat,
                                      fused_attention_packed,
                                      fused_attention_qkv,
                                      fused_attention_qkv2,
                                      fused_attention_qkv3)
from hirest_tpu.ops.quant import act_quant, ln_bf16, ln_quant

B, S, HEADS, D = 128, 257, 16, 88
HD = HEADS * D                  # 1408
DP = 128                        # padded head width (bench --padded-heads)
HDP = HEADS * DP                # 2048
SCALE = D ** -0.5


def lower_tpu(fn, *args):
    """Lower `fn` for TPU on this (CPU) host; raises on Mosaic rejections."""
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def sds(shape, dtype=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("hd,d", [(HD, D), (HDP, DP)], ids=["d88", "d128pad"])
def test_qkv3_lowers(quant, hd, d):
    fn = functools.partial(fused_attention_qkv3, scale=d ** -0.5,
                           num_heads=HEADS, quant_out=quant)
    lower_tpu(fn, sds((B, S, 3 * hd)))


@pytest.mark.parametrize("quant", [False, True])
def test_qkv2_lowers(quant):
    fn = functools.partial(fused_attention_qkv2, scale=SCALE,
                           num_heads=HEADS, quant_out=quant)
    lower_tpu(fn, sds((B, S, 3 * HD)))


def test_qkv_bias_path_lowers():
    fn = functools.partial(fused_attention_qkv, scale=SCALE, num_heads=HEADS)
    lower_tpu(fn, sds((B, S, 3 * HD)), sds((HD,)), sds((HD,)))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("hg", [0, 8, 16], ids=["v2", "v3hg8", "v3hg16"])
@pytest.mark.parametrize("hd,d", [(HD, D), (HDP, DP)], ids=["d88", "d128pad"])
def test_flat_lowers(quant, hg, hd, d):
    """The exact family the chip rejected: flat [B*S, 3HD] trunk layout."""
    fn = functools.partial(fused_attention_flat, scale=d ** -0.5,
                           num_heads=HEADS, seq_len=S, head_group=hg,
                           quant_out=quant)
    lower_tpu(fn, sds((B * S, 3 * hd)))


SP = 264  # token-padded S (pad_tokens: next multiple of 8 above 257)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("hg", [0, 8], ids=["v2", "v3hg8"])
def test_tok_padded_lowers(quant, hg):
    """pad_tokens shapes: S=264 with n_real=257 key masking, 3D and flat."""
    fn = functools.partial(fused_attention_qkv3 if hg else
                           fused_attention_qkv2, scale=SCALE,
                           num_heads=HEADS, quant_out=quant, n_real=257)
    lower_tpu(fn, sds((B, SP, 3 * HD)))
    fn = functools.partial(fused_attention_flat, scale=SCALE,
                           num_heads=HEADS, seq_len=SP, head_group=hg,
                           quant_out=quant, n_real=257)
    lower_tpu(fn, sds((B * SP, 3 * HD)))


@pytest.mark.parametrize("sp", [S, SP], ids=["s257", "s264tp"])
def test_fused_mlp_lowers(sp):
    """fused_mlp_int8 at the EVA-g MLP shapes (M=B*S, C=1408, F=6144)."""
    from hirest_tpu.ops.quant import fused_mlp_int8

    m, c, f = B * sp, HD, 6144
    fn = functools.partial(fused_mlp_int8, act="gelu_poly", row_block=sp)
    lower_tpu(fn, sds((m, c), jnp.int8), sds((m, 1), jnp.float32),
              sds((c, f), jnp.int8), sds((f,), jnp.float32),
              sds((f,), jnp.float32), sds((f, c), jnp.int8),
              sds((c,), jnp.float32), sds((c,), jnp.float32),
              sds((m, c)))


def test_v1_4d_lowers():
    fn = functools.partial(fused_attention, scale=SCALE)
    q = sds((8, HEADS, S, D))
    lower_tpu(fn, q, q, q)


def test_packed_lowers():
    fn = functools.partial(fused_attention_packed, scale=SCALE,
                           num_heads=HEADS)
    x = sds((8, S, HD))
    lower_tpu(fn, x, x, x)


@pytest.mark.parametrize("m,c", [(B * S, HD), (B * S, 6144), (2 * S, HD)],
                         ids=["ln-site", "post-fc1", "tiny-batch"])
def test_ln_quant_lowers(m, c):
    """_ln_quant_kernel at every production site (the on-chip failure was
    a 514-row block at m=32896, c=1408)."""
    fn = functools.partial(ln_quant, eps=1e-6, row_block=S)
    lower_tpu(fn, sds((m, c)), sds((c,), jnp.float32), sds((c,), jnp.float32))


@pytest.mark.parametrize("m,c", [(B * S, 6144), (2 * S, HD)])
def test_act_quant_lowers(m, c):
    fn = functools.partial(act_quant, act="gelu_poly", row_block=S)
    lower_tpu(fn, sds((m, c)))


@pytest.mark.parametrize("m", [B * S, 2 * S])
def test_ln_bf16_lowers(m):
    fn = functools.partial(ln_bf16, eps=1e-6, row_block=S)
    lower_tpu(fn, sds((m, HD)), sds((HD,), jnp.float32),
              sds((HD,), jnp.float32))


@pytest.mark.slow
def test_full_ladder_model_lowering():
    """Lower the ENTIRE bench ladder's scanned trunk for TPU at full width
    (2 layers, batch 8 — block shapes depend on S/C, not depth/batch).
    Catches dispatch-glue regressions the ops-level tests can't see."""
    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.models.eva_scan import build_scanned_vision_apply
    from hirest_tpu.utils.init import shape_only_init

    cfg = EvaVisionConfig(layers=2)
    tower = EvaVisionTower(cfg)
    params = shape_only_init(
        tower, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    x = sds((8, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ladder = [
        (False, False, 0, False, False), (True, False, 0, False, False),
        (False, False, 1, False, False), (False, False, 0, True, False),
        (False, False, 1, True, False), (False, False, 2, True, False),
        (True, True, 1, False, False), (True, False, 1, True, False),
        (True, True, 1, True, False), (True, True, 2, True, False),
        (False, False, 1, True, True), (False, False, 2, True, True),
        (False, False, 2, False, False),
    ]
    for i8, fq, kv, fl, ln in ladder:
        ap = build_scanned_vision_apply(
            params, cfg, int8=i8, fused_quant=fq, attn_v2=kv == 1,
            attn_v3=kv == 2, flat2d=fl, fused_ln=ln)
        lower_tpu(ap, x)


def test_lowering_check_catches_bad_blocks():
    """Meta-test: the cross-lowering harness actually enforces the sublane
    rule (else every test above is a tautology)."""
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2

    def bad(x):
        spec = pl.BlockSpec((257, 128), lambda i: (i, 0))
        return pl.pallas_call(
            k, grid=(2,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((514, 128), jnp.bfloat16))(x)

    with pytest.raises(ValueError, match="divisible"):
        lower_tpu(bad, sds((514, 128)))
