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

    from hirest_tpu.models.convert import (convert_checkpoint_tree,
                                           load_torch_ckpt)

    sd = load_torch_ckpt(a.src)

    tree = convert_checkpoint_tree(a.kind, sd)

    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "wb") as f:
        f.write(serialization.to_bytes(tree))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
