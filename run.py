#!/usr/bin/env python
"""CLI-parity training/eval entry point: `python run.py --train ...`
(same flags as the reference run.py; see scripts/run.sh)."""

from __future__ import annotations

import os
import random

import numpy as np

from hirest_tpu.config import HirestConfig


def main():
    config = HirestConfig.from_args()

    random.seed(config.seed)
    np.random.seed(config.seed)

    from hirest_tpu.utils.device import apply_device_config

    apply_device_config(config.device)

    from hirest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print(config.to_json())

    tokenizer = None
    vocab_path = os.path.join(config.pretrained_dir, "vocab.txt")
    if os.path.exists(vocab_path):
        from hirest_tpu.tokenizers import WordPieceTokenizer

        tokenizer = WordPieceTokenizer(vocab_path)
    else:
        print(f"WARNING: {vocab_path} not found - step captions will be raw ids")

    from hirest_tpu.train.trainer import Trainer

    trainer = Trainer(config, wordpiece_tokenizer=tokenizer)
    if config.load is not None:
        path = config.load
        if path.endswith(".pth"):
            trainer.load_torch_checkpoint(path)
        else:
            trainer.load(path)

    if config.end_to_end:
        from hirest_tpu.infer.pipeline import run_end_to_end

        run_end_to_end(trainer)
    elif config.train:
        trainer.train()
    else:
        results = {}
        for task in config.tasks:
            if "test" in trainer.loaders:
                results[task] = trainer.evaluate(
                    trainer.loaders["test"][task], task, has_target=False)
                out = os.path.join(config.ckpt_dir, f"test_{task}_BEST.json")
                os.makedirs(config.ckpt_dir, exist_ok=True)
                import json

                with open(out, "w") as f:
                    json.dump(results[task], f, indent=4)
                print("Saved", out)


if __name__ == "__main__":
    main()
