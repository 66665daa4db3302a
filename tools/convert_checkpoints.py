#!/usr/bin/env python
"""Offline checkpoint conversion: torch .pt/.bin/.pth -> flax msgpack.

Converts once on a torch-equipped host so production TPU jobs never import
torch. Supported kinds: eva (text+vision towers), clip4caption
(encoder+decoder subtrees), whisper (HF), minilm (HF BERT), joint
(trained HiREST .pth).

    python tools/convert_checkpoints.py --kind eva \
        --src pretrained_weights/eva_clip_psz14.pt --out converted/eva.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["eva", "clip4caption", "whisper", "minilm",
                            "joint", "clip_b32"])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    from flax import serialization

    from hirest_tpu.models.convert import load_torch_ckpt

    sd = load_torch_ckpt(a.src)

    if a.kind == "eva":
        from hirest_tpu.models.convert import convert_eva_text, convert_eva_vision

        tree = {"text": convert_eva_text(sd), "vision": convert_eva_vision(sd)}
    elif a.kind == "clip_b32":
        from hirest_tpu.models.openai_clip import convert_clip_text, convert_clip_vision

        tree = {"text": convert_clip_text(sd), "vision": convert_clip_vision(sd)}
    elif a.kind == "clip4caption":
        from hirest_tpu.config import JointModelConfig
        from hirest_tpu.models.convert import (convert_caption_decoder,
                                               convert_visual_encoder)

        cfg = JointModelConfig()
        tree = {"encoder": convert_visual_encoder(
                    sd, cfg.visual.num_hidden_layers,
                    cfg.visual.max_position_embeddings, prefix="visual."),
                "decoder": convert_caption_decoder(
                    sd, cfg.decoder.num_decoder_layers, prefix="decoder.")}
    elif a.kind == "whisper":
        from hirest_tpu.models.whisper import (convert_whisper_decoder,
                                               convert_whisper_encoder,
                                               infer_whisper_config)

        if any(k.startswith("model.") for k in sd):
            sd = {k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.")}
        cfg = infer_whisper_config(sd)  # any whisper size converts
        tree = {"encoder": convert_whisper_encoder(sd, cfg),
                "decoder": convert_whisper_decoder(sd, cfg)}
    elif a.kind == "minilm":
        from hirest_tpu.models.minilm import convert_minilm

        tree = {"encoder": convert_minilm(sd)}
    else:  # joint
        from hirest_tpu.config import HirestConfig
        from hirest_tpu.models.convert import convert_moment_model

        tree = {"params": convert_moment_model(sd, HirestConfig().joint_model_config())}

    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "wb") as f:
        f.write(serialization.to_bytes(tree))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
