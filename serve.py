#!/usr/bin/env python
"""Inference server: `python serve.py --video_feature_dir feats/ [--load ckpt]
[--port 8080]`. See hirest_tpu/serve/server.py for the endpoint schema."""

from __future__ import annotations


def main():
    import argparse
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--video_feature_dir", required=True)
    p.add_argument("--asr_dir", default=None)
    p.add_argument("--asr_feature_dir", default=None)
    p.add_argument("--load", default=None)
    p.add_argument("--pretrained_dir", default="./pretrained_weights")
    p.add_argument("--n_model_frames", type=int, default=-1)
    p.add_argument("--num_beams", type=int, default=3)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--device", type=str, default="tpu",
                   help="'cpu' pins the jax platform (reference args.py:10)")
    a = p.parse_args()

    from hirest_tpu.utils.device import apply_device_config

    apply_device_config(a.device)

    from hirest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hirest_tpu.config import HirestConfig
    from hirest_tpu.serve import ServingEngine, make_server

    config = HirestConfig(
        video_feature_dir=a.video_feature_dir, asr_dir=a.asr_dir,
        asr_feature_dir=a.asr_feature_dir, n_model_frames=a.n_model_frames,
        num_beams=a.num_beams, pretrained_dir=a.pretrained_dir,
        task_moment_retrieval=True, task_moment_segmentation=True,
        task_step_captioning=True, eval_batch_size=1)

    tokenizer = None
    vocab = os.path.join(a.pretrained_dir, "vocab.txt")
    if os.path.exists(vocab):
        from hirest_tpu.tokenizers import WordPieceTokenizer

        tokenizer = WordPieceTokenizer(vocab)

    engine = ServingEngine(config, wordpiece_tokenizer=tokenizer)
    if a.load:
        if a.load.endswith(".pth"):
            engine.trainer.load_torch_checkpoint(a.load)
        else:
            engine.trainer.load(a.load)
    if not a.no_warmup:
        print("warmup:", engine.warmup())

    server = make_server(engine, a.host, a.port)
    print(f"serving on http://{a.host}:{a.port} "
          f"({len(engine.video_ids)} indexed videos)")
    server.serve_forever()


if __name__ == "__main__":
    main()
