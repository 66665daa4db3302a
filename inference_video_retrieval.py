#!/usr/bin/env python
"""CLI-parity zero-shot video retrieval: same flags as the reference
inference_video_retrieval.py. `--video_retrieval_model clip_g` uses
EVA-CLIP-g; `clip` uses OpenAI CLIP ViT-B/32. Scores text @ video.T and
dumps VR_results/{run_name}.json."""

from __future__ import annotations

import os
import random

import numpy as np

from hirest_tpu.config import HirestConfig


def _build_towers(config):
    import jax

    from hirest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if config.fp16 else jnp.float32

    if config.video_retrieval_model == "clip":
        from hirest_tpu.models.openai_clip import (
            ClipTextTower, ClipVisionTower, convert_clip_text, convert_clip_vision)
        from hirest_tpu.models.convert import load_torch_ckpt

        text_tower, vision_tower = ClipTextTower(dtype=dtype), ClipVisionTower(dtype=dtype)
        ckpt = config.load or os.path.join(config.pretrained_dir, "ViT-B-32.pt")
        if os.path.exists(ckpt):
            sd = load_torch_ckpt(ckpt)
            text_params = {"params": convert_clip_text(sd)}
            vision_params = {"params": convert_clip_vision(sd)}
            print(f"Loaded CLIP ViT-B/32 from {ckpt}")
        else:
            text_params = text_tower.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 77), jnp.int32))
            vision_params = vision_tower.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 224, 224, 3)))
            print(f"WARNING: {ckpt} not found - using random-init CLIP")
    else:  # clip_g
        from hirest_tpu.models.eva_clip import EvaTextTower, EvaVisionTower
        from hirest_tpu.models.convert import (
            convert_eva_text, convert_eva_vision, load_torch_ckpt)

        text_tower, vision_tower = EvaTextTower(dtype=dtype), EvaVisionTower(dtype=dtype)
        ckpt = os.path.join(config.pretrained_dir, "eva_clip_psz14.pt")
        if os.path.exists(ckpt):
            sd = load_torch_ckpt(ckpt)
            text_params = {"params": convert_eva_text(sd)}
            vision_params = {"params": convert_eva_vision(sd)}
            print("Loaded EVA CLIP G")
        else:
            text_params = text_tower.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 77), jnp.int32))
            vision_params = None  # built lazily only for --raw_frame
            print(f"WARNING: {ckpt} not found - using random-init text tower")

    text_apply = jax.jit(lambda p, ids: text_tower.apply(p, ids))
    encode_text = lambda ids: text_apply(text_params, jnp.asarray(ids))  # noqa: E731

    encode_image = None
    if config.raw_frame:
        if vision_params is None:
            vision_params = vision_tower.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 224, 224, 3)))
        vision_apply = jax.jit(lambda p, im: vision_tower.apply(p, im))
        encode_image = lambda im: vision_apply(vision_params, jnp.asarray(im))  # noqa: E731

    return encode_text, encode_image


def main():
    config = HirestConfig.from_args()
    random.seed(config.seed)
    np.random.seed(config.seed)

    # honor --device cpu before any backend touch (utils/device.py explains
    # why the env var alone cannot); without this the CLI hangs at device
    # init whenever the TPU tunnel is unreachable even on CPU-only runs
    from hirest_tpu.utils.device import apply_device_config

    apply_device_config(config.device)

    from hirest_tpu.infer.retrieval import run_video_retrieval
    from hirest_tpu.models.eva_clip import preprocess_image

    encode_text, encode_image = _build_towers(config)
    run_video_retrieval(config, encode_text, encode_image,
                        preprocess_image if config.raw_frame else None)


if __name__ == "__main__":
    main()
