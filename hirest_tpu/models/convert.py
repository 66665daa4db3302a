"""Torch-checkpoint -> flax-parameter converters.

Maps the reference checkpoint key layouts onto this framework's param trees:

- `eva_clip_psz14.pt`       -> EvaTextTower / EvaVisionTower params
  (key layout: EVA_clip/eva_model.py:177-334, EVA_clip/vit_model.py:248-351)
- `clip4caption_vit-b-32_model.bin` -> MomentModel.encoder / MomentModel.decoder
  (key layout: clip4caption/modules/{module_visual,module_decoder}.py)
- trained HiREST joint checkpoints (`BEST.pth`) -> full MomentModel params,
  including the reference's legacy key remappings `vis_encoder.` -> `encoder.`
  and DDP `module.` prefix stripping (trainer_base.py:69-85,128-147).

Conventions: torch Linear weight [out, in] -> flax kernel [in, out];
LayerNorm weight/bias -> scale/bias; Embedding weight -> embedding.
All values are plain numpy arrays (torch is only used by `load_torch_ckpt`,
as an offline host-side dependency).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from hirest_tpu.config import DecoderConfig, EvaTextConfig, EvaVisionConfig, JointModelConfig


def load_torch_ckpt(path: str) -> dict:
    """Load a torch checkpoint (.bin/.pt or .safetensors — the current
    transformers save default) into a flat {key: np.ndarray} dict (host-side)."""
    import torch

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v, dtype=np.float32)
                for k, v in load_file(path).items()}
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().cpu().float().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _np(sd: Mapping, key: str) -> np.ndarray:
    return np.asarray(sd[key], dtype=np.float32)


def _linear(sd, prefix):
    return {"kernel": _np(sd, f"{prefix}.weight").T, "bias": _np(sd, f"{prefix}.bias")}


def _ln(sd, prefix):
    return {"scale": _np(sd, f"{prefix}.weight"), "bias": _np(sd, f"{prefix}.bias")}


# ---------------------------------------------------------------------------
# EVA-CLIP
# ---------------------------------------------------------------------------


def convert_eva_text(sd: Mapping, config: EvaTextConfig = EvaTextConfig()) -> dict:
    """state dict with `text.*` keys (or bare) -> EvaTextTower params['params']."""
    if any(k.startswith("text.") for k in sd):
        sd = {k[len("text."):]: v for k, v in sd.items() if k.startswith("text.")}
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


def convert_eva_vision(sd: Mapping, config: EvaVisionConfig = EvaVisionConfig()) -> dict:
    """state dict with `visual.*` keys (or bare) -> EvaVisionTower params['params']."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    conv_w = _np(sd, "patch_embed.proj.weight")  # [width, 3, p, p]
    # patchify layout is (row, col, channel) flattened -> kernel [p*p*3, width]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    p = {
        "patch_embed": {"kernel": patch_kernel, "bias": _np(sd, "patch_embed.proj.bias")},
        "cls_token": _np(sd, "cls_token"),
        "pos_embed": _np(sd, "pos_embed"),
        "norm": _ln(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(config.layers):
        r = f"blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": _ln(sd, f"{r}.norm1"),
            "norm2": _ln(sd, f"{r}.norm2"),
            "attn": {
                "qkv": {"kernel": _np(sd, f"{r}.attn.qkv.weight").T},
                "q_bias": _np(sd, f"{r}.attn.q_bias"),
                "v_bias": _np(sd, f"{r}.attn.v_bias"),
                "out": _linear(sd, f"{r}.attn.proj"),
            },
            "mlp_fc1": _linear(sd, f"{r}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{r}.mlp.fc2"),
        }
    return p


# ---------------------------------------------------------------------------
# CLIP4Caption visual encoder + decoder
# ---------------------------------------------------------------------------


def _bert_attention(sd, prefix, q="query", k="key", v="value"):
    return {q: _linear(sd, f"{prefix}.{q}"), k: _linear(sd, f"{prefix}.{k}"),
            v: _linear(sd, f"{prefix}.{v}")}


def convert_visual_encoder(sd: Mapping, num_layers: int,
                           max_position_embeddings: int = 2048,
                           prefix: str = "visual.") -> dict:
    """clip4caption VisualModel keys -> MomentModel 'encoder' subtree.

    The pretrained position table has 512 rows while HiREST enlarges the
    config to 2048 (modeling.py:110); pretrained rows are copied in and the
    tail stays zero — the reference's init_preweight surgery keeps the
    freshly-initialized tail too.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    pos_src = _np(sd, "embeddings.position_embeddings.weight")
    pos = np.zeros((max_position_embeddings, pos_src.shape[1]), dtype=np.float32)
    pos[: min(len(pos_src), max_position_embeddings)] = pos_src[:max_position_embeddings]
    p = {
        "word_embeddings": _linear(sd, "embeddings.word_embeddings"),
        "position_embeddings": pos,
        "emb_LayerNorm": _ln(sd, "embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        r = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": _bert_attention(sd, f"{r}.attention.self"),
            "attention_output": {
                "dense": _linear(sd, f"{r}.attention.output.dense"),
                "LayerNorm": _ln(sd, f"{r}.attention.output.LayerNorm"),
            },
            "ffn": {
                "intermediate": _linear(sd, f"{r}.intermediate.dense"),
                "output": _linear(sd, f"{r}.output.dense"),
                "LayerNorm": _ln(sd, f"{r}.output.LayerNorm"),
            },
        }
    return p


def convert_caption_decoder(sd: Mapping, num_layers: int, prefix: str = "decoder.") -> dict:
    """clip4caption DecoderModel keys -> MomentModel 'decoder' subtree."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    p = {
        "word_embeddings": _np(sd, "embeddings.word_embeddings.weight"),
        "position_embeddings": _np(sd, "embeddings.position_embeddings.weight"),
        "emb_LayerNorm": _ln(sd, "embeddings.LayerNorm"),
        "cls_transform": _linear(sd, "classifier.cls.predictions.transform.dense"),
        "cls_LayerNorm": _ln(sd, "classifier.cls.predictions.transform.LayerNorm"),
        "cls_bias": _np(sd, "classifier.cls.predictions.bias"),
    }
    for i in range(num_layers):
        r = f"decoder.layer.{i}"
        p[f"layer_{i}"] = {
            "slf_attn": _bert_attention(sd, f"{r}.slf_attn.att"),
            "slf_output": {
                "dense": _linear(sd, f"{r}.slf_attn.output.dense"),
                "LayerNorm": _ln(sd, f"{r}.slf_attn.output.LayerNorm"),
            },
            "enc_attn": _bert_attention(sd, f"{r}.enc_attn.att"),
            "enc_output": {
                "dense": _linear(sd, f"{r}.enc_attn.output.dense"),
                "LayerNorm": _ln(sd, f"{r}.enc_attn.output.LayerNorm"),
            },
            "ffn": {
                "intermediate": _linear(sd, f"{r}.intermediate.dense"),
                "output": _linear(sd, f"{r}.output.dense"),
                "LayerNorm": _ln(sd, f"{r}.output.LayerNorm"),
            },
        }
    return p


# ---------------------------------------------------------------------------
# Full joint model
# ---------------------------------------------------------------------------


def normalize_joint_keys(sd: Mapping) -> dict:
    """Apply the reference's checkpoint-loading key surgery
    (trainer_base.py:69-85,128-147): strip DDP 'module.' and remap legacy
    'vis_encoder.' -> 'encoder.'."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)
        k = re.sub(r"^(model\.)?vis_encoder\.", r"\1encoder.", k)
        out[k] = v
    return out


def convert_moment_model(sd: Mapping, config: JointModelConfig) -> dict:
    """Trained HiREST joint checkpoint -> MomentModel params['params'].

    Accepts checkpoints with the frozen `clip_model.*` keys already stripped
    (trainer_base.py:109-126 strips them at save time).
    """
    sd = normalize_joint_keys(sd)
    p = {
        "temporal_fc1": _linear(sd, "temporal_embed.0"),
        "temporal_fc2": _linear(sd, "temporal_embed.2"),
        "mask_embed": {"embedding": _np(sd, "mask_embed.weight")},
        "boundary_embed": {"embedding": _np(sd, "boundary_embed.weight")},
        "clip_g_map": _linear(sd, "clip_g_map"),
        "clip_g_map_text": _linear(sd, "clip_g_map_text"),
        "normalize_video": _ln(sd, "clip4cap_model.normalize_video.visual_norm2d"),
        "start_predictor": _linear(sd, "start_predictor.0"),
        "end_predictor": _linear(sd, "end_predictor.0"),
        "segment_predictor": _linear(sd, "segment_predictor.0"),
        "encoder": convert_visual_encoder(
            sd, config.visual.num_hidden_layers,
            config.visual.max_position_embeddings, prefix="clip4cap_model.visual."),
        "decoder": convert_caption_decoder(
            sd, config.decoder.num_decoder_layers, prefix="clip4cap_model.decoder."),
    }
    if config.use_asr and "asr_enc_layer.0.weight" in sd:
        p["asr_norm"] = _ln(sd, "asr_enc_layer.0")
        p["asr_proj"] = _linear(sd, "asr_enc_layer.1")
    return p


def init_moment_model_from_clip4caption(params: dict, clip4cap_sd: Mapping,
                                        config: JointModelConfig) -> dict:
    """Overwrite a freshly initialized MomentModel param tree's encoder and
    decoder with the pretrained CLIP4Caption weights (the reference's
    from_pretrained initializer path, modeling.py:102-110)."""
    params = dict(params)
    params["encoder"] = convert_visual_encoder(
        clip4cap_sd, config.visual.num_hidden_layers,
        config.visual.max_position_embeddings, prefix="visual.")
    params["decoder"] = convert_caption_decoder(
        clip4cap_sd, config.decoder.num_decoder_layers, prefix="decoder.")
    return params


def convert_checkpoint_tree(kind: str, sd: Mapping) -> dict:
    """kind -> converted flax param tree. The SINGLE source of the
    checkpoint-conversion wiring shared by tools/convert_checkpoints.py
    (offline converter) and tools/validate_real_weights.py (validation
    runbook) — two copies of this dispatch had already drifted (the HF
    whisper 'model.' prefix strip lived in only one of them)."""
    if kind == "eva":
        return {"text": convert_eva_text(sd), "vision": convert_eva_vision(sd)}
    if kind == "clip_b32":
        from hirest_tpu.models.openai_clip import (convert_clip_text,
                                                   convert_clip_vision)

        return {"text": convert_clip_text(sd), "vision": convert_clip_vision(sd)}
    if kind == "clip4caption":
        cfg = JointModelConfig()
        return {"encoder": convert_visual_encoder(
                    sd, cfg.visual.num_hidden_layers,
                    cfg.visual.max_position_embeddings, prefix="visual."),
                "decoder": convert_caption_decoder(
                    sd, cfg.decoder.num_decoder_layers, prefix="decoder.")}
    if kind == "whisper":
        from hirest_tpu.models.whisper import (convert_whisper_decoder,
                                               convert_whisper_encoder,
                                               infer_whisper_config)

        if any(k.startswith("model.") for k in sd):  # HF layout
            sd = {k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.")}
        cfg = infer_whisper_config(sd)  # any whisper size converts
        return {"encoder": convert_whisper_encoder(sd, cfg),
                "decoder": convert_whisper_decoder(sd, cfg)}
    if kind == "minilm":
        from hirest_tpu.models.minilm import convert_minilm

        return {"encoder": convert_minilm(sd)}
    if kind == "joint":
        from hirest_tpu.config import HirestConfig

        return {"params": convert_moment_model(
            sd, HirestConfig().joint_model_config())}
    raise ValueError(f"unknown checkpoint kind {kind!r}")
