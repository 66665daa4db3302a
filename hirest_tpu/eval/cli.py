"""Evaluation CLI — flag parity with reference evaluate.py:414-501.

Usage:
    python evaluate.py --task {video_retrieval,moment_retrieval,
                               moment_segmentation,step_captioning}
                       --pred_data PRED.json [--gt_data GT.json]
                       [--print_per_category] [--preprocess_moment_bounds]
                       [--replace_pred_moment_bounds] [--frame_dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os

from hirest_tpu.eval.captions import evaluate_step_captions
from hirest_tpu.eval.metrics import (
    Categories,
    compute_step_bound_scores,
    evaluate_moment_retrieval,
    evaluate_video_retrieval,
    preprocess_moment_bounds,
)

DEFAULT_DATA_ROOT = "./data"


def get_eval_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Run experiment", add_help=False)
    parser.add_argument("--task", type=str, required=True)
    parser.add_argument("--gt_data", type=str, required=False)
    parser.add_argument("--pred_data", type=str, required=True)
    parser.add_argument("--device", type=int, default=-1)
    parser.add_argument("--print_per_category", action="store_true")
    parser.add_argument("--help", action="store_true")
    parser.add_argument("--preprocess_moment_bounds", action="store_true")
    parser.add_argument("--replace_pred_moment_bounds", action="store_true")
    parser.add_argument("--frame_dir", type=str, default="None")
    parser.add_argument("--data_root", type=str, default=DEFAULT_DATA_ROOT,
                        help="root containing splits/ and evaluation/ (TPU extension)")
    parser.add_argument("--meteor_version", type=str, default="1.5",
                        choices=["1.5", "2005"],
                        help="METEOR scoring model; the reference scores "
                             "captions with the METEOR-1.5 jar, so 1.5 is "
                             "the parity default (TPU extension)")
    return parser


def _try_build_clipscore(frame_dir: str, pretrained_dir: str = "./pretrained_weights"):
    """CLIPScore plugin backed by the JAX CLIP ViT-B/32 (reference
    evaluate.py:204-268 uses torch clip ViT-B/32). Returns None when the
    checkpoint is unavailable."""
    ckpt = os.path.join(pretrained_dir, "ViT-B-32.pt")
    if not os.path.exists(ckpt):
        print(f"CLIPScore disabled: {ckpt} not found")
        return None
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from hirest_tpu.eval.captions import make_clipscore_fn
    from hirest_tpu.models.convert import load_torch_ckpt
    from hirest_tpu.models.eva_clip import preprocess_image
    from hirest_tpu.models.openai_clip import (
        ClipTextTower, ClipVisionTower, convert_clip_text, convert_clip_vision)
    from hirest_tpu.tokenizers import clip_tokenize

    sd = load_torch_ckpt(ckpt)
    text_tower, vision_tower = ClipTextTower(), ClipVisionTower()
    tp = {"params": convert_clip_text(sd)}
    vp = {"params": convert_clip_vision(sd)}
    t_apply = jax.jit(lambda p, ids: text_tower.apply(p, ids))
    v_apply = jax.jit(lambda p, im: vision_tower.apply(p, im))

    return make_clipscore_fn(
        frame_dir,
        encode_image_fn=lambda im: v_apply(vp, jnp.asarray(im)),
        encode_text_fn=lambda texts: t_apply(tp, jnp.asarray(clip_tokenize(texts))),
        preprocess_fn=lambda path: preprocess_image(Image.open(path)),
    )


def _try_build_bertscore(pretrained_dir: str = "./pretrained_weights"):
    """TPU-native BERTScore when a local BERT checkpoint + vocab exist."""
    vocab = os.path.join(pretrained_dir, "vocab.txt")
    for name in ("bertscore.bin", "bert-base-uncased.bin", "all-MiniLM-L6-v2.bin"):
        ckpt = os.path.join(pretrained_dir, name)
        if os.path.exists(ckpt) and os.path.exists(vocab):
            from hirest_tpu.eval.bertscore import make_bertscore_fn
            from hirest_tpu.models.minilm import MiniLmConfig

            cfg = (MiniLmConfig(hidden_size=768, num_hidden_layers=12,
                                intermediate_size=3072)
                   if "bert-base" in name or name == "bertscore.bin"
                   else MiniLmConfig())
            return make_bertscore_fn(ckpt, vocab, config=cfg)
    print("BERTScore disabled: no local BERT checkpoint in", pretrained_dir)
    return None


def _try_build_entailment(pretrained_dir: str = "./pretrained_weights"):
    """Entailment scorer (reference evaluate.py:197-201): the flax NLI
    cross-encoder for BERT-architecture checkpoints (default), falling back
    to the torch HF plugin for other architectures (RoBERTa/DeBERTa NLI)."""
    nli_dir = os.path.join(pretrained_dir, "nli")
    if os.path.isdir(nli_dir):
        try:
            from hirest_tpu.models.nli import make_nli_entailment_fn

            return make_nli_entailment_fn(nli_dir)
        except Exception as e:
            print(f"flax NLI path unavailable ({e}); trying torch plugin")
            from hirest_tpu.eval.bertscore import make_hf_entailment_fn

            return make_hf_entailment_fn(nli_dir)
    print("Entailment disabled: no NLI model at", nli_dir)
    return None


def main(argv=None) -> dict:
    args = get_eval_parser().parse_args(argv)
    print(args)

    splits_gt = os.path.join(args.data_root, "splits/all_data_test.json")
    moment_gt = os.path.join(args.data_root, "evaluation/formatted_moment_evaluation_gt.json")
    category_path = os.path.join(args.data_root, "evaluation/categories.json")

    pred_data = args.pred_data
    if args.preprocess_moment_bounds:
        if args.gt_data is None:
            args.gt_data = moment_gt
        new_pred = preprocess_moment_bounds(args.gt_data, args.pred_data)
        if args.replace_pred_moment_bounds:
            assert isinstance(args.pred_data, str), "You must provide a path to the source file"
            with open(args.pred_data, "w") as f:
                json.dump(new_pred, f)
        pred_data = new_pred

    categories = Categories.load(category_path) if os.path.exists(category_path) else Categories.single()

    if args.help:
        print("Please see the 'examples_for_evaluation_folder' for input examples")
        return {}

    clipscore_fn = bertscore_fn = entailment_fn = None
    if args.task == "step_captioning":
        if args.frame_dir != "None":
            clipscore_fn = _try_build_clipscore(args.frame_dir)
        bertscore_fn = _try_build_bertscore()
        entailment_fn = _try_build_entailment()

    if args.task == "video_retrieval":
        result = evaluate_video_retrieval(args.gt_data or splits_gt, pred_data, categories)
    elif args.task == "moment_retrieval":
        result = evaluate_moment_retrieval(args.gt_data or splits_gt, pred_data, categories)
    elif args.task == "moment_segmentation":
        result = compute_step_bound_scores(args.gt_data or moment_gt, pred_data, categories)
    elif args.task == "step_captioning":
        if not args.print_per_category:
            categories = Categories.single()
        from hirest_tpu.eval.coco import CocoEvaluator
        result = evaluate_step_captions(
            args.gt_data or moment_gt, pred_data, categories,
            clipscore_fn=clipscore_fn, bertscore_fn=bertscore_fn,
            entailment_fn=entailment_fn,
            coco_evaluator=CocoEvaluator(
                meteor_version=args.meteor_version))
    else:
        result = {"all": {}}

    if not args.print_per_category:
        print(result["all"])
    else:
        print(result)
    return result


if __name__ == "__main__":
    main()
