#!/usr/bin/env python
"""Custom-video end-to-end CLI (the custom_video_pipeline notebook as a
script): one video + one prompt -> hierarchical moments/segments/captions.

    python pipeline_custom_video.py --video path/to/video.mp4 \
        --prompt "Make oatmeal pancakes" --load checkpoints/BEST \
        [--extract_asr] [--work_dir out/]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--load", default=None)
    p.add_argument("--work_dir", default=None)
    p.add_argument("--extract_asr", action="store_true")
    p.add_argument("--pretrained_dir", default="./pretrained_weights")
    p.add_argument("--num_beams", type=int, default=3)
    p.add_argument("--device", type=str, default="tpu",
                   help="'cpu' pins the jax platform (reference args.py:10)")
    a = p.parse_args()

    import os

    from hirest_tpu.utils.device import apply_device_config

    apply_device_config(a.device)

    from hirest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hirest_tpu.config import HirestConfig
    from hirest_tpu.infer.custom_video import run_custom_video

    config = HirestConfig(
        task_moment_retrieval=True, task_moment_segmentation=True,
        task_step_captioning=True, end_to_end=True, load=a.load,
        num_beams=a.num_beams, pretrained_dir=a.pretrained_dir,
        eval_batch_size=1, ckpt_dir=a.work_dir or "./custom_video_out")

    tokenizer = None
    vocab = os.path.join(a.pretrained_dir, "vocab.txt")
    if os.path.exists(vocab):
        from hirest_tpu.tokenizers import WordPieceTokenizer

        tokenizer = WordPieceTokenizer(vocab)

    result = run_custom_video(a.video, a.prompt, config,
                              wordpiece_tokenizer=tokenizer,
                              work_dir=a.work_dir, extract_asr=a.extract_asr)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
