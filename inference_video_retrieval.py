#!/usr/bin/env python
"""CLI-parity zero-shot video retrieval: same flags as the reference
inference_video_retrieval.py. Encodes prompts with the EVA-CLIP-g text
tower (and frames with the vision tower under --raw_frame), scores
text @ video.T, dumps VR_results/{run_name}.json."""

from __future__ import annotations

import os
import random

import numpy as np

from hirest_tpu.config import HirestConfig


def main():
    config = HirestConfig.from_args()
    random.seed(config.seed)
    np.random.seed(config.seed)

    import jax
    import jax.numpy as jnp

    from hirest_tpu.models.eva_clip import EvaTextTower, EvaVisionTower, preprocess_image
    from hirest_tpu.models.convert import convert_eva_text, convert_eva_vision, load_torch_ckpt
    from hirest_tpu.infer.retrieval import run_video_retrieval

    dtype = jnp.bfloat16 if config.fp16 else jnp.float32
    text_tower = EvaTextTower(dtype=dtype)
    ckpt = os.path.join(config.pretrained_dir, "eva_clip_psz14.pt")
    if os.path.exists(ckpt):
        sd = load_torch_ckpt(ckpt)
        text_params = {"params": convert_eva_text(sd)}
        print("Loaded EVA CLIP G")
    else:
        sd = None
        text_params = text_tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
        print(f"WARNING: {ckpt} not found - using random-init text tower")

    text_apply = jax.jit(lambda p, ids: text_tower.apply(p, ids))
    encode_text = lambda ids: text_apply(text_params, jnp.asarray(ids))  # noqa: E731

    encode_image = None
    preprocess = None
    if config.raw_frame:
        vision_tower = EvaVisionTower(dtype=dtype)
        if sd is not None:
            vision_params = {"params": convert_eva_vision(sd)}
        else:
            vision_params = vision_tower.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 224, 224, 3)))
        vision_apply = jax.jit(lambda p, im: vision_tower.apply(p, im))
        encode_image = lambda im: vision_apply(vision_params, jnp.asarray(im))  # noqa: E731
        preprocess = preprocess_image

    run_video_retrieval(config, encode_text, encode_image, preprocess)


if __name__ == "__main__":
    main()
