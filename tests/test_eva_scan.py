"""Parity tests for the scan-over-layers EVA vision forward.

The scanned forward must be numerically identical (up to dtype noise) to
the unrolled flax EvaVisionTower, and the int8-quantized variant must stay
directionally faithful (cosine) — it replaces the throughput role of
reference extraction/video_features/extract_features.py:42-68.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hirest_tpu.config import EvaVisionConfig
from hirest_tpu.models.eva_clip import EvaVisionTower
from hirest_tpu.models.eva_scan import build_scanned_vision_apply
from hirest_tpu.utils.init import shape_only_init

TINY = EvaVisionConfig(image_size=28, layers=3, width=64, head_width=16,
                       mlp_ratio=4.0, patch_size=14, embed_dim=32)


@pytest.fixture(scope="module")
def tiny_setup():
    tower = EvaVisionTower(TINY, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    ref = np.asarray(tower.apply(params, imgs))
    return params, imgs, ref


def test_scanned_matches_unrolled_f32(tiny_setup):
    params, imgs, ref = tiny_setup
    apply = build_scanned_vision_apply(params, TINY, int8=False,
                                       use_pallas=False, dtype=jnp.float32)
    out = np.asarray(apply(imgs))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_scanned_bf16_close(tiny_setup):
    params, imgs, ref = tiny_setup
    apply = build_scanned_vision_apply(params, TINY, int8=False,
                                       use_pallas=False, dtype=jnp.bfloat16)
    out = np.asarray(apply(imgs))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.99), cos


def test_scanned_int8_cosine(tiny_setup):
    params, imgs, ref = tiny_setup
    apply = build_scanned_vision_apply(params, TINY, int8=True,
                                       use_pallas=False, dtype=jnp.bfloat16)
    out = np.asarray(apply(imgs))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.98), cos


def test_scanned_pallas_interpret(tiny_setup):
    """The Pallas packed path (head_dim 128 after padding) inside the scan,
    in interpret mode on CPU."""
    from hirest_tpu.models.eva_pad import pad_vision_head_params

    params, imgs, ref = tiny_setup
    padded, padded_cfg = pad_vision_head_params(params, TINY, new_head=128)
    apply = build_scanned_vision_apply(padded, padded_cfg, int8=False,
                                       use_pallas=True, interpret=True,
                                       dtype=jnp.float32)
    out = np.asarray(apply(imgs))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_scanned_flat2d_matches_3d():
    """flat2d (the [B*S, C] trunk with the 2D flat attention kernels) must
    match the 3D path numerically in every supported combination."""
    cfg = EvaVisionConfig(image_size=28, layers=3, width=128, head_width=32,
                          mlp_ratio=4.0, patch_size=14, embed_dim=32)
    tower = EvaVisionTower(cfg, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(11).normal(size=(4, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    kw = dict(use_pallas=True, interpret=True, dtype=jnp.float32,
              fast_gelu=False)
    ref = np.asarray(build_scanned_vision_apply(params, cfg, **kw)(imgs))
    assert not np.allclose(ref, 0)
    # anchor the pallas-v1 ref to the pure-XLA tower AT THE SAME DIMS: the
    # variant asserts below compare pallas kernels against each other, so
    # without this a systematic error in their shared plumbing would pass
    xla = np.asarray(build_scanned_vision_apply(
        params, cfg, use_pallas=False, dtype=jnp.float32,
        fast_gelu=False)(imgs))
    np.testing.assert_allclose(xla, ref, rtol=2e-4, atol=2e-4)
    for ver in ({}, {"attn_v2": True}, {"attn_v3": True}):
        out = np.asarray(build_scanned_vision_apply(
            params, cfg, flat2d=True, **ver, **kw)(imgs))
        np.testing.assert_allclose(ref, out, rtol=2e-5, atol=2e-5,
                                   err_msg=f"kernel={ver}")
    # int8 flat vs int8 3D (identical quantization points -> tight match)
    ref8 = np.asarray(build_scanned_vision_apply(
        params, cfg, int8=True, **kw)(imgs))
    out8 = np.asarray(build_scanned_vision_apply(
        params, cfg, int8=True, flat2d=True, **kw)(imgs))
    np.testing.assert_allclose(ref8, out8, rtol=2e-4, atol=2e-4)
    # fused-quant flat (ln_quant/act_quant 2D + flat attention quant
    # epilogue) vs the plain int8 3D reference
    for ver in ({"attn_v2": False}, {"attn_v2": True}, {"attn_v3": True}):
        outfq = np.asarray(build_scanned_vision_apply(
            params, cfg, int8=True, fused_quant=True, flat2d=True,
            **ver, **kw)(imgs))
        np.testing.assert_allclose(ref8, outfq, rtol=2e-3, atol=2e-3,
                                   err_msg=f"fq kernel={ver}")


def test_scanned_fused_ln_matches():
    """fused_ln (pallas one-pass bf16 LayerNorm at both block LN sites)
    must match the XLA-LN path exactly, in 3D and flat2d trunks."""
    cfg = EvaVisionConfig(image_size=28, layers=3, width=128, head_width=32,
                          mlp_ratio=4.0, patch_size=14, embed_dim=32)
    tower = EvaVisionTower(cfg, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(13).normal(size=(4, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    kw = dict(use_pallas=True, interpret=True, dtype=jnp.float32,
              fast_gelu=False)
    ref = np.asarray(build_scanned_vision_apply(params, cfg, **kw)(imgs))
    assert not np.allclose(ref, 0)
    for flat in (False, True):
        out = np.asarray(build_scanned_vision_apply(
            params, cfg, fused_ln=True, flat2d=flat, **kw)(imgs))
        np.testing.assert_allclose(ref, out, rtol=2e-6, atol=2e-6,
                                   err_msg=f"flat2d={flat}")


def test_scanned_attn_v2_v3_match_v1():
    """attn_v2/v3 (lean kernels, biases pre-folded into the qkv projection
    epilogue; v3 additionally batches the per-head dots) must match the v1
    kernel path numerically. Needs a 128-aligned row (packed path), unlike
    TINY's 64-lane width."""
    cfg = EvaVisionConfig(image_size=28, layers=3, width=128, head_width=32,
                          mlp_ratio=4.0, patch_size=14, embed_dim=32)
    tower = EvaVisionTower(cfg, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(7).normal(size=(4, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    kw = dict(use_pallas=True, interpret=True, dtype=jnp.float32,
              fast_gelu=False)
    a = np.asarray(build_scanned_vision_apply(params, cfg, **kw)(imgs))
    assert not np.allclose(a, 0)
    for ver in ({"attn_v2": True}, {"attn_v3": True}):
        b = np.asarray(build_scanned_vision_apply(params, cfg, **ver,
                                                  **kw)(imgs))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   err_msg=f"kernel={ver}")


def test_scanned_pad_tokens_matches():
    """pad_tokens (token axis padded to the next sublane multiple of 8 so
    the flat<->3D attention reshapes are true bitcasts; measured 60.8
    ms/call of pure relayout copies on the unpadded int8+fq+v3+flat winner)
    must match the unpadded path numerically: pad keys are masked to
    exactly-zero attention weight in the lean kernels (n_real), so real
    tokens never see them. Covers every production composition (v2/v3 x
    3D/flat x bf16/int8-fq)."""
    cfg = EvaVisionConfig(image_size=28, layers=3, width=128, head_width=32,
                          mlp_ratio=4.0, patch_size=14, embed_dim=32)
    tower = EvaVisionTower(cfg, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(17).normal(size=(4, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    kw = dict(use_pallas=True, interpret=True, dtype=jnp.float32,
              fast_gelu=False)
    for ver in ({"attn_v2": True}, {"attn_v3": True}):
        for flat in (False, True):
            ref = np.asarray(build_scanned_vision_apply(
                params, cfg, flat2d=flat, **ver, **kw)(imgs))
            assert not np.allclose(ref, 0)
            out = np.asarray(build_scanned_vision_apply(
                params, cfg, flat2d=flat, pad_tokens=True, **ver,
                **kw)(imgs))
            np.testing.assert_allclose(ref, out, rtol=2e-6, atol=2e-6,
                                       err_msg=f"{ver} flat={flat}")
    ref8 = np.asarray(build_scanned_vision_apply(
        params, cfg, int8=True, fused_quant=True, flat2d=True,
        attn_v3=True, **kw)(imgs))
    out8 = np.asarray(build_scanned_vision_apply(
        params, cfg, int8=True, fused_quant=True, flat2d=True,
        attn_v3=True, pad_tokens=True, **kw)(imgs))
    np.testing.assert_allclose(ref8, out8, rtol=2e-6, atol=2e-6)
    with pytest.raises(AssertionError):
        # v1 kernels have no key masking — pad_tokens must refuse them
        build_scanned_vision_apply(params, cfg, pad_tokens=True, **kw)


def test_scanned_fused_mlp_matches():
    """fused_mlp (one-kernel int8 fc1 -> gelu -> requant -> fc2 -> residual,
    ops/quant.fused_mlp_int8) vs the unfused fq path. Not bit-exact: the
    fused kernel keeps the gelu input in f32 (the unfused path rounds the
    fc1 output through bf16) and mlp_hidden > n_chunk would use finer
    per-chunk requant scales — both strictly-no-worse numerics."""
    cfg = EvaVisionConfig(image_size=28, layers=3, width=128, head_width=32,
                          mlp_ratio=4.0, patch_size=14, embed_dim=32)
    tower = EvaVisionTower(cfg, dtype=jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(23).normal(size=(4, 28, 28, 3)), jnp.float32)
    params = shape_only_init(tower, imgs[:1])
    kw = dict(use_pallas=True, interpret=True, dtype=jnp.float32,
              fast_gelu=False, int8=True, fused_quant=True, attn_v3=True)
    for flat, tp in ((True, True), (True, False), (False, False)):
        ref = np.asarray(build_scanned_vision_apply(
            params, cfg, flat2d=flat, pad_tokens=tp, **kw)(imgs))
        assert not np.allclose(ref, 0)
        out = np.asarray(build_scanned_vision_apply(
            params, cfg, flat2d=flat, pad_tokens=tp, fused_mlp=True,
            **kw)(imgs))
        np.testing.assert_allclose(ref, out, rtol=2e-3, atol=2e-3,
                                   err_msg=f"flat={flat} tp={tp}")


def test_uint8_frontend_matches_normalized(tiny_setup):
    """Folding (x/255 - mean)/std into the patch embed: raw uint8 frames
    through a uint8_input forward == normalized f32 frames through the
    standard forward (f32, no pallas) to float tolerance."""
    from hirest_tpu.models.eva_clip import CLIP_MEAN, CLIP_STD

    params, _, _ = tiny_setup
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, size=(3, 28, 28, 3), dtype=np.uint8)
    normalized = ((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD

    apply_norm = build_scanned_vision_apply(params, TINY, use_pallas=False,
                                            dtype=jnp.float32)
    apply_u8 = build_scanned_vision_apply(params, TINY, use_pallas=False,
                                          dtype=jnp.float32,
                                          uint8_input=True)
    want = np.asarray(apply_norm(jnp.asarray(normalized)))
    got = np.asarray(apply_u8(jnp.asarray(u8)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_uint8_frontend_encoder_wiring(tmp_path, monkeypatch):
    """make_eva_encoder(uint8_frontend=True) returns the u8 preprocess and
    an apply that consumes its output end-to-end (tiny config — the
    function resolves EvaVisionConfig at call time)."""
    import hirest_tpu.config as config_mod
    from hirest_tpu.extraction.features import make_eva_encoder

    tiny224 = EvaVisionConfig(image_size=224, layers=2, width=64,
                              head_width=16, mlp_ratio=4.0, patch_size=56,
                              embed_dim=32)
    monkeypatch.setattr(config_mod, "EvaVisionConfig", lambda: tiny224)
    enc, pre = make_eva_encoder(str(tmp_path), dtype_name="float32",
                                use_pallas=False, uint8_frontend=True)
    img = np.random.default_rng(0).integers(
        0, 256, size=(300, 400, 3), dtype=np.uint8)
    x = pre(img)
    assert x.dtype == np.uint8 and x.shape == (224, 224, 3)
    out = np.asarray(enc(x[None]))
    assert out.shape == (1, tiny224.embed_dim) and np.all(np.isfinite(out))


def test_staged_flag_mismatch_rejected(tiny_setup):
    """Reusing a staged (consts, xs, meta) upload with different
    int8/dtype/uint8_input flags must fail loudly — a uint8_input mismatch
    would otherwise silently corrupt embeddings (ADVICE r3)."""
    from hirest_tpu.models.eva_scan import stage_scanned_params

    params, imgs, _ = tiny_setup
    staged = stage_scanned_params(params, TINY, dtype=jnp.float32,
                                  uint8_input=True)
    with pytest.raises(AssertionError, match="uint8_input"):
        build_scanned_vision_apply(params, TINY, use_pallas=False,
                                   dtype=jnp.float32, staged=staged)
    # matching flags pass (and consume the staged upload)
    apply = build_scanned_vision_apply(params, TINY, use_pallas=False,
                                       dtype=jnp.float32, uint8_input=True,
                                       staged=staged)
    u8 = np.zeros((1, 28, 28, 3), np.uint8)
    assert np.all(np.isfinite(np.asarray(apply(jnp.asarray(u8)))))
    # meta-less 2-tuples are rejected — the guard cannot be bypassed by
    # slicing the staged tuple
    with pytest.raises(ValueError):
        build_scanned_vision_apply(params, TINY, use_pallas=False,
                                   dtype=jnp.float32, uint8_input=True,
                                   staged=staged[:2])
