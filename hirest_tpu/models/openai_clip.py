"""OpenAI CLIP ViT-B/32 in flax — the reference's alternate retrieval
backbone (`--video_retrieval_model clip`) and the CLIPScore model for
step-captioning evaluation.

Architecture (reference EVA_clip/model.py:140-276, the vendored OpenAI
CLIP): pre-LN transformer with QuickGELU; vision tower with class
embedding, ln_pre/ln_post and a [width, embed] projection; text tower
identical in shape to the EVA one but width 512 / 8 heads / QuickGELU.
The text block structure is shared with eva_clip.TextBlock.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from hirest_tpu.config import EvaTextConfig
from hirest_tpu.models.eva_clip import TextBlock
from hirest_tpu.models.layers import causal_mask


@dataclass(frozen=True)
class ClipVisionConfig:
    """ViT-B/32 defaults."""

    image_size: int = 224
    layers: int = 12
    width: int = 768
    heads: int = 12
    patch_size: int = 32
    embed_dim: int = 512
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_B32_TEXT = EvaTextConfig(context_length=77, vocab_size=49408, width=512,
                              heads=8, layers=12, embed_dim=512)


class ClipTextTower(nn.Module):
    """OpenAI CLIP text encoder: ids [B, 77] -> [B, embed_dim]."""

    config: EvaTextConfig = CLIP_B32_TEXT
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
                          act="quick_gelu", dtype=self.dtype,
                          name=f"block_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_final", dtype=self.dtype)(x)
        eot_idx = jnp.argmax(text_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param("text_projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim))
        return (x @ proj.astype(self.dtype)).astype(jnp.float32)


class ClipVisionTower(nn.Module):
    """ViT-B/32 image encoder: [B, 224, 224, 3] -> [B, 512].

    pool=True is the standard OpenAI CLIP head (ln_post on the cls token,
    then project) — the main-path behavior (`clip.load("ViT-B/32")`,
    inference_video_retrieval.py:169). pool=False is the vendored
    EVA-modified variant (EVA_clip/model.py:252-272): drop the cls token,
    ln_post + project ALL patch tokens -> [B, grid^2, embed_dim]."""

    config: ClipVisionConfig = ClipVisionConfig()
    dtype: jnp.dtype = jnp.float32
    pool: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, hh, ww, c = images.shape
        p = cfg.patch_size
        grid = cfg.image_size // p
        assert hh == ww == cfg.image_size

        # patchify-as-matmul (conv1 has no bias in OpenAI CLIP)
        x = images.astype(self.dtype)
        x = x.reshape(b, grid, p, grid, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, p * p * c)
        x = nn.Dense(cfg.width, use_bias=False, name="patch_embed",
                     dtype=self.dtype)(x)

        cls = self.param("class_embedding", nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.width,))
        cls_tok = jnp.broadcast_to(cls.astype(self.dtype)[None, None], (b, 1, cfg.width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.width))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_pre", dtype=self.dtype)(x)

        for i in range(cfg.layers):
            x = TextBlock(heads=cfg.heads, norm_eps=cfg.norm_eps,
                          act="quick_gelu", dtype=self.dtype,
                          name=f"block_{i}")(x, None)

        x = x[:, 0] if self.pool else x[:, 1:]
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_post", dtype=self.dtype)(x)
        proj = self.param("proj", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim))
        return (x @ proj.astype(self.dtype)).astype(jnp.float32)


def build_clip_from_state_dict(sd):
    """Shape-sniffing factory mirroring the reference `build_model`
    (EVA_clip/model.py:433-471): infers the variant (VisionTransformer vs
    ModifiedResNet, text dims) from the checkpoint's shapes and returns
    `(vision_tower, vision_params, text_tower, text_params, logit_scale)`
    ready to `.apply`. Accepts torch tensors or numpy arrays."""
    import numpy as np

    shape = lambda k: tuple(sd[k].shape)  # noqa: E731
    if "visual.proj" in sd:  # ViT variant
        width = shape("visual.conv1.weight")[0]
        patch = shape("visual.conv1.weight")[-1]
        grid = round((shape("visual.positional_embedding")[0] - 1) ** 0.5)
        layers = len([k for k in sd if k.startswith("visual.")
                      and k.endswith(".attn.in_proj_weight")])
        vcfg = ClipVisionConfig(image_size=patch * grid, layers=layers,
                                width=width, heads=width // 64,
                                patch_size=patch,
                                embed_dim=shape("visual.proj")[1])
        # the vendored surface's ViT is the EVA-modified all-tokens variant
        vision_tower = ClipVisionTower(vcfg, pool=False)
        vision_params = convert_clip_vision(sd, vcfg)
    else:  # ModifiedResNet variant
        from hirest_tpu.models.clip_resnet import (ClipResNetConfig,
                                                   ClipResNetTower,
                                                   convert_clip_resnet)

        counts = tuple(
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}")}) for b in (1, 2, 3, 4))
        width = shape("visual.layer1.0.conv1.weight")[0]
        out_grid = round(
            (shape("visual.attnpool.positional_embedding")[0] - 1) ** 0.5)
        rcfg = ClipResNetConfig(
            layers=counts, output_dim=shape("visual.attnpool.c_proj.weight")[0],
            heads=width * 32 // 64, image_size=out_grid * 32, width=width)
        vision_tower = ClipResNetTower(rcfg)
        vision_params = convert_clip_resnet(sd, rcfg)

    tcfg = EvaTextConfig(
        context_length=shape("positional_embedding")[0],
        vocab_size=shape("token_embedding.weight")[0],
        width=shape("ln_final.weight")[0],
        heads=shape("ln_final.weight")[0] // 64,
        layers=len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks")}),
        embed_dim=shape("text_projection")[1])
    text_tower = ClipTextTower(tcfg)
    text_params = convert_clip_text(sd, tcfg)
    ls = sd["logit_scale"]
    logit_scale = float(np.exp(np.asarray(
        ls.detach().cpu().numpy() if hasattr(ls, "detach") else ls)))
    return vision_tower, vision_params, text_tower, text_params, logit_scale


# ---------------------------------------------------------------------------
# Converter from the OpenAI CLIP torch state dict
# ---------------------------------------------------------------------------


def convert_clip_text(sd, config: EvaTextConfig = CLIP_B32_TEXT) -> dict:
    """OpenAI CLIP checkpoint (bare top-level text keys) -> ClipTextTower params."""
    from hirest_tpu.models.convert import _ln, _linear, _np

    p = {
        "token_embedding": {"embedding": _np(sd, "token_embedding.weight")},
        "positional_embedding": _np(sd, "positional_embedding"),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd, "text_projection"),
    }
    for i in range(config.layers):
        r = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln_1": _ln(sd, f"{r}.ln_1"),
            "ln_2": _ln(sd, f"{r}.ln_2"),
            "attn": {
                "qkv": {"kernel": _np(sd, f"{r}.attn.in_proj_weight").T},
                "qkv_bias": _np(sd, f"{r}.attn.in_proj_bias"),
                "out": _linear(sd, f"{r}.attn.out_proj"),
            },
            "mlp_c_fc": _linear(sd, f"{r}.mlp.c_fc"),
            "mlp_c_proj": _linear(sd, f"{r}.mlp.c_proj"),
        }
    return p


def convert_clip_vision(sd, config: ClipVisionConfig = ClipVisionConfig()) -> dict:
    """OpenAI CLIP checkpoint (`visual.*` keys) -> ClipVisionTower params."""
    from hirest_tpu.models.convert import _ln, _linear, _np

    sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    conv_w = _np(sd, "conv1.weight")  # [width, 3, p, p], no bias
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    p = {
        "patch_embed": {"kernel": patch_kernel},
        "class_embedding": _np(sd, "class_embedding"),
        "positional_embedding": _np(sd, "positional_embedding"),
        "ln_pre": _ln(sd, "ln_pre"),
        "ln_post": _ln(sd, "ln_post"),
        "proj": _np(sd, "proj"),
    }
    for i in range(config.layers):
        r = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln_1": _ln(sd, f"{r}.ln_1"),
            "ln_2": _ln(sd, f"{r}.ln_2"),
            "attn": {
                "qkv": {"kernel": _np(sd, f"{r}.attn.in_proj_weight").T},
                "qkv_bias": _np(sd, f"{r}.attn.in_proj_bias"),
                "out": _linear(sd, f"{r}.attn.out_proj"),
            },
            "mlp_c_fc": _linear(sd, f"{r}.mlp.c_fc"),
            "mlp_c_proj": _linear(sd, f"{r}.mlp.c_proj"),
        }
    return p
