"""Pallas fused-attention correctness (interpret mode on CPU) vs XLA."""

import numpy as np
import pytest

import jax.numpy as jnp

from hirest_tpu.ops.attention import _xla_attention, fused_attention


@pytest.mark.parametrize("shape", [(2, 4, 17, 8), (1, 2, 32, 24), (2, 16, 37, 88)])
def test_pallas_matches_xla(shape):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))
    scale = shape[-1] ** -0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    got = np.asarray(fused_attention(q, k, v, scale, use_pallas=True,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 4, 17, 8), (2, 12, 48, 64)])
def test_pallas_key_mask_matches_xla(shape):
    """Padded keys must be excluded from the softmax (VERDICT r1 weak #3)."""
    rng = np.random.default_rng(7)
    b, h, s, d = shape
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))
    n_valid = s - 5
    key_mask = jnp.asarray((np.arange(s) < n_valid)[None].repeat(b, 0), jnp.int32)
    scale = d ** -0.5
    want = np.asarray(_xla_attention(q, k, v, scale, key_mask=key_mask))
    got = np.asarray(fused_attention(q, k, v, scale, key_mask=key_mask,
                                     use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # and the mask genuinely matters: unmasked output differs
    unmasked = np.asarray(fused_attention(q, k, v, scale, use_pallas=True,
                                          interpret=True))
    assert np.abs(unmasked - want).max() > 1e-3


def test_pallas_cross_attention_rectangular():
    """Decoder cross-attention shape: 48 queries over 20 visual keys."""
    rng = np.random.default_rng(8)
    b, h, sq, sk, d = 2, 12, 48, 20, 64
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    scale = d ** -0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    got = np.asarray(fused_attention(q, k, v, scale, use_pallas=True,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_pallas_key_mask_and_rectangular():
    from hirest_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(9)
    b, sq, sk, h, d = 2, 33, 21, 4, 22
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    key_mask = jnp.asarray((np.arange(sk) < 15)[None].repeat(b, 0), jnp.int32)
    scale = d ** -0.5
    want = np.asarray(fused_attention_packed(q, k, v, scale, h,
                                             key_mask=key_mask, use_pallas=False))
    got = np.asarray(fused_attention_packed(q, k, v, scale, h,
                                            key_mask=key_mask, use_pallas=True,
                                            interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hpb", [1, 2, 4])
def test_packed_head_groups_match(hpb):
    """heads_per_block groups heads into one VMEM block per grid cell
    (fewer cells, contiguous DMAs); every grouping must agree."""
    from hirest_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(11)
    b, s, h, d = 2, 19, 4, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
               for _ in range(3))
    key_mask = jnp.asarray((np.arange(s) < 13)[None].repeat(b, 0), jnp.int32)
    scale = d ** -0.5
    want = np.asarray(fused_attention_packed(q, k, v, scale, h,
                                             key_mask=key_mask,
                                             use_pallas=False))
    got = np.asarray(fused_attention_packed(q, k, v, scale, h,
                                            key_mask=key_mask, use_pallas=True,
                                            interpret=True,
                                            heads_per_block=hpb))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_vision_block_pallas_flag_matches():
    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    import jax

    cfg = EvaVisionConfig(image_size=28, patch_size=14, layers=1, width=32,
                          head_width=8, mlp_ratio=2.0, embed_dim=16)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(2, 28, 28, 3)),
                       jnp.float32)
    base = EvaVisionTower(cfg)
    params = base.init(jax.random.PRNGKey(0), imgs)
    want = np.asarray(base.apply(params, imgs))

    # same params, pallas path (interpret on CPU via monkeypatched default)
    import hirest_tpu.ops.attention as A

    orig = A._pallas_attention
    orig_packed = A._pallas_attention_packed
    A._pallas_attention = (
        lambda q, k, v, s, **kw: orig(q, k, v, s, **{**kw, "interpret": True}))
    A._pallas_attention_packed = (
        lambda q, k, v, s, h, **kw: orig_packed(
            q, k, v, s, h, **{**kw, "interpret": True}))
    try:
        got = np.asarray(EvaVisionTower(cfg, use_pallas=True).apply(params, imgs))
    finally:
        A._pallas_attention = orig
        A._pallas_attention_packed = orig_packed
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_pallas_matches_xla():
    import jax.numpy as jnp
    from hirest_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(3)
    b, s, h, d = 2, 37, 4, 22
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
               for _ in range(3))
    scale = d ** -0.5
    want = np.asarray(fused_attention_packed(q, k, v, scale, h, use_pallas=False))
    got = np.asarray(fused_attention_packed(q, k, v, scale, h, use_pallas=True,
                                            interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_vision_tower_close_to_float():
    """int8 path must stay numerically close to the float tower (cosine) —
    it is a throughput mode for the frozen feature extractor."""
    import jax
    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.models.eva_quant import build_int8_vision_apply

    cfg = EvaVisionConfig(image_size=28, patch_size=14, layers=2, width=32,
                          head_width=8, mlp_ratio=2.0, embed_dim=16)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)),
                       jnp.float32)
    tower = EvaVisionTower(cfg)
    params = tower.init(jax.random.PRNGKey(0), imgs)
    want = np.asarray(tower.apply(params, imgs))

    import hirest_tpu.ops.attention as A

    orig = A._pallas_attention
    A._pallas_attention = (
        lambda q, k, v, s, **kw: orig(q, k, v, s, **{**kw, "interpret": True}))
    try:
        apply = build_int8_vision_apply(params, cfg, dtype=jnp.float32)
        got = np.asarray(apply(imgs))
    finally:
        A._pallas_attention = orig

    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert (cos > 0.99).all(), cos


def test_padded_head_transform_is_identity():
    """Zero-padding heads 88->128 (with the folded scale fix) must produce
    the exact same tower outputs."""
    import jax
    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.models.eva_pad import pad_vision_head_params

    cfg = EvaVisionConfig(image_size=28, patch_size=14, layers=2, width=24,
                          head_width=6, mlp_ratio=2.0, embed_dim=16)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)),
                       jnp.float32)
    tower = EvaVisionTower(cfg)
    params = tower.init(jax.random.PRNGKey(1), imgs)
    want = np.asarray(tower.apply(params, imgs))

    padded_params, padded_cfg = pad_vision_head_params(params, cfg, new_head=8)
    assert padded_cfg.num_heads == cfg.num_heads == 4
    got = np.asarray(EvaVisionTower(padded_cfg).apply(padded_params, imgs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flat_kernels_match_3d_at_eva_dims():
    """fused_attention_flat ([B*S, 3HD] 2D trunk layout) must be exact vs
    the 3D fused-qkv kernels at the real EVA-g dims (S=257, 16x88)."""
    from hirest_tpu.ops.attention import (fused_attention_flat,
                                          fused_attention_qkv,
                                          fused_attention_qkv2)

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 257, 16, 88
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * D)), jnp.float32) * 0.2
    qb = jnp.asarray(rng.normal(size=(H * D,)), jnp.float32) * 0.1
    vb = jnp.asarray(rng.normal(size=(H * D,)), jnp.float32) * 0.1
    scale = D ** -0.5

    ref = np.asarray(fused_attention_qkv(qkv, qb, vb, scale, H,
                                         interpret=True))
    flat = np.asarray(fused_attention_flat(
        qkv.reshape(B * S, 3 * H * D), scale, H, S, q_bias=qb, v_bias=vb,
        interpret=True)).reshape(B, S, H * D)
    np.testing.assert_allclose(ref, flat, atol=1e-6)

    bias3 = jnp.concatenate([qb, jnp.zeros_like(qb), vb], -1)
    ref2 = np.asarray(fused_attention_qkv2(qkv + bias3, scale, H,
                                           interpret=True))
    flat2 = np.asarray(fused_attention_flat(
        (qkv + bias3).reshape(B * S, 3 * H * D), scale, H, S,
        rows_per_cell=2, interpret=True)).reshape(B, S, H * D)
    np.testing.assert_allclose(ref2, flat2, atol=1e-6)


def test_batched_heads_kernels_match_at_eva_dims():
    """v3 (batched per-head dots, _attn_heads_batched) must match the v1
    fused-qkv kernel at the real EVA-g dims, in the 3D and flat layouts,
    for even and ragged head groupings, and through the quant epilogue."""
    from hirest_tpu.ops.attention import (fused_attention_flat,
                                          fused_attention_qkv,
                                          fused_attention_qkv3)

    rng = np.random.default_rng(3)
    B, S, H, D = 2, 257, 16, 88
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * D)), jnp.float32) * 0.2
    qb = jnp.asarray(rng.normal(size=(H * D,)), jnp.float32) * 0.1
    vb = jnp.asarray(rng.normal(size=(H * D,)), jnp.float32) * 0.1
    scale = D ** -0.5
    bias3 = jnp.concatenate([qb, jnp.zeros_like(qb), vb], -1)

    ref = np.asarray(fused_attention_qkv(qkv, qb, vb, scale, H,
                                         interpret=True))
    for group in (8, 16, 5):  # even, single-group, ragged (16 = 3*5 + 1)
        v3 = np.asarray(fused_attention_qkv3(qkv + bias3, scale, H,
                                             head_group=group,
                                             interpret=True))
        np.testing.assert_allclose(ref, v3, atol=1e-6,
                                   err_msg=f"group={group}")
    flat3 = np.asarray(fused_attention_flat(
        (qkv + bias3).reshape(B * S, 3 * H * D), scale, H, S, head_group=8,
        interpret=True)).reshape(B, S, H * D)
    np.testing.assert_allclose(ref, flat3, atol=1e-6)

    # quant epilogues: codes * scales reconstruct the reference output
    q3, s3 = fused_attention_qkv3(qkv + bias3, scale, H, head_group=8,
                                  interpret=True, quant_out=True)
    np.testing.assert_allclose(np.asarray(q3) * np.asarray(s3), ref,
                               atol=2e-2)
    qf, sf = fused_attention_flat(
        (qkv + bias3).reshape(B * S, 3 * H * D), scale, H, S, head_group=8,
        interpret=True, quant_out=True)
    np.testing.assert_allclose(
        (np.asarray(qf) * np.asarray(sf)).reshape(B, S, H * D), ref,
        atol=2e-2)


def test_unrolled_pallas_tower_interpret_on_cpu():
    """EvaVisionTower(use_pallas=True) must be runnable on CPU via the
    interpret flag (kernels run in interpret mode; the selected path is
    unchanged) and match the XLA tower numerically."""
    import numpy as np

    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import EvaVisionTower
    from hirest_tpu.utils.init import shape_only_init

    cfg = EvaVisionConfig(image_size=28, layers=2, width=128, head_width=128,
                          mlp_ratio=2.0, patch_size=14, embed_dim=32)
    imgs = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 28, 28, 3)), jnp.float32)
    ref_tower = EvaVisionTower(cfg, dtype=jnp.float32)
    params = shape_only_init(ref_tower, imgs[:1])
    ref = np.asarray(ref_tower.apply(params, imgs))
    pal = EvaVisionTower(cfg, dtype=jnp.float32, use_pallas=True,
                         interpret=True)
    out = np.asarray(pal.apply(params, imgs))
    np.testing.assert_allclose(ref, out, rtol=2e-5, atol=2e-5)
