"""EVA-CLIP-g towers in flax, designed TPU-first.

Architecture parity targets (frozen feature extractors for the joint model):
- Text tower: 12-layer pre-LN transformer, width 768, causal mask, EOT
  pooling at the argmax token id, 768->1024 projection
  (reference EVA_clip/eva_model.py:177-250).
- Vision tower: BEiT-style ViT-g/14 — 40 layers, width 1408, 16 heads of
  width 88, MLP 6144, abs pos-embed, cls pooling + final LayerNorm(1e-6),
  1408->1024 head (reference EVA_clip/vit_model.py:248-351 with the
  EVA_CLIP_g_14.json config). The q/v-only qkv bias quirk
  (vit_model.py:78-84,120-126) is preserved for checkpoint fidelity.

TPU-first choices:
- Patch embedding is a patchify-reshape + single [588 -> 1408] matmul
  instead of a conv — identical math, lands directly on the MXU.
- All block compute runs in a configurable dtype (bf16 by default for the
  frozen towers); softmax accumulates in f32 (layers.dot_product_attention).
- No dropout / drop-path: the towers only ever run frozen in this framework
  (reference modeling.py:120-129 freezes them and forces eval mode).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hirest_tpu.config import EvaTextConfig, EvaVisionConfig
from hirest_tpu.models.layers import (
    ACTIVATIONS,
    MultiHeadAttention,
    causal_mask,
    gelu,
)


class TextBlock(nn.Module):
    """Pre-LN residual attention block (eva_model.py:110-159); also the
    OpenAI-CLIP block shape when act='quick_gelu'."""

    heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        h = nn.LayerNorm(epsilon=self.norm_eps, name="ln_1", dtype=self.dtype)(x)
        h = MultiHeadAttention(num_heads=self.heads, qkv_mode="fused",
                               dtype=self.dtype, name="attn")(h, bias=bias)
        x = x + h
        h = nn.LayerNorm(epsilon=self.norm_eps, name="ln_2", dtype=self.dtype)(x)
        width = x.shape[-1]
        h = nn.Dense(int(width * self.mlp_ratio), name="mlp_c_fc", dtype=self.dtype)(h)
        h = ACTIVATIONS[self.act](h)
        h = nn.Dense(width, name="mlp_c_proj", dtype=self.dtype)(h)
        return x + h


class EvaTextTower(nn.Module):
    """CLIP text encoder: token ids [B, 77] -> joint embedding [B, 1024]."""

    config: EvaTextConfig = EvaTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding",
                     dtype=self.dtype)(text_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        bias = causal_mask(x.shape[1], dtype=jnp.float32)
        for i in range(cfg.layers):
            x = TextBlock(heads=cfg.heads, norm_eps=cfg.norm_eps,
                          dtype=self.dtype, name=f"block_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_final", dtype=self.dtype)(x)
        # EOT pooling: the EOT token has the highest id in each row
        eot_idx = jnp.argmax(text_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param("text_projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim))
        return (x @ proj.astype(self.dtype)).astype(jnp.float32)


class VisionBlock(nn.Module):
    """BEiT pre-norm block with q/v-only bias attention (vit_model.py:153-182)."""

    heads: int
    head_dim: int
    mlp_hidden: int
    norm_eps: float = 1e-6
    use_pallas: bool = False
    interpret: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm1", dtype=self.dtype)(x)
        h = MultiHeadAttention(num_heads=self.heads, head_dim=self.head_dim,
                               qkv_mode="fused_qv_bias", dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               interpret=self.interpret, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm2", dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_hidden, name="mlp_fc1", dtype=self.dtype)(h)
        h = gelu(h)
        h = nn.Dense(x.shape[-1], name="mlp_fc2", dtype=self.dtype)(h)
        return x + h


class EvaVisionTower(nn.Module):
    """ViT-g/14 image encoder: [B, 224, 224, 3] (NHWC) -> [B, 1024]."""

    config: EvaVisionConfig = EvaVisionConfig()
    use_pallas: bool = False
    interpret: bool = False  # CPU interpret mode for the pallas kernels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, hh, ww, c = images.shape
        p = cfg.patch_size
        grid = cfg.image_size // p
        assert hh == ww == cfg.image_size, f"expected {cfg.image_size}px input, got {hh}x{ww}"

        # Patchify as one big matmul: [B, grid, p, grid, p, C] -> [B, N, p*p*C]
        x = images.astype(self.dtype)
        x = x.reshape(b, grid, p, grid, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, p * p * c)
        x = nn.Dense(cfg.width, name="patch_embed", dtype=self.dtype)(x)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.width))
        x = x + pos.astype(self.dtype)

        for i in range(cfg.layers):
            x = VisionBlock(heads=cfg.num_heads, head_dim=cfg.head_width,
                            mlp_hidden=cfg.mlp_hidden, norm_eps=cfg.norm_eps,
                            use_pallas=self.use_pallas,
                            interpret=self.interpret,
                            dtype=self.dtype, name=f"block_{i}")(x)

        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm", dtype=self.dtype)(x)
        x = x[:, 0]  # cls pooling (use_mean_pooling=False in the reference config)
        x = nn.Dense(cfg.embed_dim, name="head", dtype=self.dtype)(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Image preprocessing (host-side): the torchvision transform of
# EVA_clip/eva_clip.py:125-153 — resize shorter side to 224 (bicubic),
# center-crop 224, scale to [0,1], normalize with CLIP mean/std.
# ---------------------------------------------------------------------------

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def _resize_center_crop(img, image_size: int):
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    return img.crop((left, top, left + image_size, top + image_size))


def preprocess_image(img, image_size: int = 224) -> np.ndarray:
    """PIL image / HxWx3 uint8 array -> [image_size, image_size, 3] float32 (NHWC)."""
    arr = np.asarray(_resize_center_crop(img, image_size),
                     dtype=np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def preprocess_image_u8(img, image_size: int = 224) -> np.ndarray:
    """Resize + center-crop ONLY -> [image_size, image_size, 3] uint8.

    For forwards built with uint8_input=True (eva_scan.fold_uint8_frontend):
    normalization runs inside the patch-embed matmul, so the host ships raw
    bytes — 4x less host->device transfer than the f32 pipeline."""
    return np.asarray(_resize_center_crop(img, image_size), dtype=np.uint8)


def build_eva_model_and_transforms(model_name: str = "EVA_CLIP_g_14",
                                   pretrained: str | None = None,
                                   dtype=jnp.bfloat16, use_pallas: bool = True,
                                   padded_heads: bool = False,
                                   scan: bool = True, int8: bool = False,
                                   text_config: EvaTextConfig | None = None,
                                   vision_config: EvaVisionConfig | None = None):
    """Factory with the reference's surface (EVA_clip/eva_clip.py:155-171):
    returns (model, preprocess) where `model` exposes jitted
    `encode_text(ids [B,77]) -> [B,1024]` and
    `encode_image(images NHWC) -> [B,1024]`.

    `pretrained` is the torch `eva_clip_psz14.pt` checkpoint (converted on
    load); without it the towers are randomly initialized (loudly)."""
    import os
    from types import SimpleNamespace

    import jax

    from hirest_tpu.utils.init import shape_only_init

    assert model_name == "EVA_CLIP_g_14", f"unknown model {model_name}"
    text_cfg = text_config or EvaTextConfig()
    text_tower = EvaTextTower(text_cfg, dtype=dtype)
    vision_cfg = vision_config or EvaVisionConfig()
    vision_tower = EvaVisionTower(vision_cfg, dtype=dtype, use_pallas=use_pallas)

    if pretrained and os.path.exists(pretrained):
        from hirest_tpu.models.convert import (convert_eva_text,
                                               convert_eva_vision,
                                               load_torch_ckpt)

        sd = load_torch_ckpt(pretrained)
        text_params = {"params": convert_eva_text(sd)}
        vision_params = {"params": convert_eva_vision(sd)}
        print(f"Loaded EVA CLIP G from {pretrained}")
    else:
        text_params = shape_only_init(
            text_tower, jnp.zeros((1, text_cfg.context_length), jnp.int32))
        vision_params = shape_only_init(
            vision_tower,
            jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3), dtype))
        print(f"WARNING: {pretrained!r} not found - EVA towers are random-init")

    if padded_heads:
        from hirest_tpu.models.eva_pad import pad_vision_head_params

        vision_params, vision_cfg = pad_vision_head_params(vision_params, vision_cfg)
        vision_tower = EvaVisionTower(vision_cfg, dtype=dtype, use_pallas=use_pallas)

    text_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), text_params)
    text_apply = jax.jit(lambda p, ids: text_tower.apply(p, ids))

    if scan:
        # production image path: scan-over-layers + v3 batched-heads kernel
        # (one-block compile; fastest measured config — 283.1 fps on-chip
        # 2026-08-18, BENCHLOG.md; inert when use_pallas is off)
        from hirest_tpu.models.eva_scan import build_scanned_vision_apply

        scanned = build_scanned_vision_apply(vision_params, vision_cfg,
                                             int8=int8, use_pallas=use_pallas,
                                             attn_v3=use_pallas,
                                             fused_quant=int8 and use_pallas,
                                             flat2d=int8 and use_pallas,
                                             pad_tokens=int8 and use_pallas,
                                             fused_mlp=int8 and use_pallas,
                                             dtype=dtype)
        encode_image = lambda im: scanned(jnp.asarray(im, dtype))  # noqa: E731
        vision_dev = vision_params
    else:
        vision_dev = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype),
                                            vision_params)
        vision_apply = jax.jit(lambda p, im: vision_tower.apply(p, im))
        encode_image = lambda im: vision_apply(vision_dev, jnp.asarray(im, dtype))  # noqa: E731

    model = SimpleNamespace(
        encode_text=lambda ids: text_apply(text_params, jnp.asarray(ids)),
        encode_image=encode_image,
        text_params=text_params, vision_params=vision_dev,
        text_tower=text_tower, vision_tower=vision_tower)
    return model, preprocess_image
