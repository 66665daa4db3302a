#!/usr/bin/env python
"""Real-weight validation runbook (north star: reference evaluate.py:414-501
score parity within 0.1 on all four tasks, BASELINE.md).

No real checkpoints ship in this image; this script makes the validation a
single command the moment they are reachable:

    python tools/validate_real_weights.py \
        --joint       /path/BEST.pth \
        --eva         /path/eva_clip_psz14.pt \
        --clip4caption /path/clip4caption_vit-b-32_model.bin \
        --whisper     /path/hf_whisper_small.en \
        --data_root   /root/reference/data \
        --video_feature_dir /path/eva_features \
        --reference_scores  /path/ref_scores.json \
        --out /tmp/real_weight_validation

Stages (each skipped gracefully when its inputs are absent):
  1. convert   — torch checkpoints -> flax msgpack (models/convert.py)
  2. predict   — joint-model predictions for moment_retrieval /
                 moment_segmentation / step_captioning on the val split,
                 plus the video_retrieval score matrix
  3. score     — our evaluate CLI (eval/cli.py) on each prediction JSON
  4. diff      — |ours - reference| <= 0.1 per metric, from a
                 {task: {metric: value}} JSON of reference-run scores

`--dry-run` exercises the full plumbing today: random weights, a tiny
annotation slice, synthesized features ([n_seconds,1024] visual), fake text
encoder — proving every stage runs unattended end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[validate] {msg}", flush=True)


# ---------------------------------------------------------------------------
# Stage 1: convert
# ---------------------------------------------------------------------------


def convert_all(args, outdir: str) -> dict:
    """Convert every supplied torch checkpoint; returns {kind: msgpack path}."""
    from flax import serialization

    from hirest_tpu.models.convert import (convert_checkpoint_tree,
                                           load_torch_ckpt)

    os.makedirs(outdir, exist_ok=True)
    converted = {}

    def save(kind, tree):
        path = os.path.join(outdir, f"{kind}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(tree))
        converted[kind] = path
        log(f"converted {kind} -> {path}")

    for kind, src in (("eva", args.eva), ("clip4caption", args.clip4caption),
                      ("whisper", args.whisper)):
        if not (src and os.path.exists(src)):
            continue
        if kind == "whisper" and os.path.isdir(src):  # HF checkpoint dir
            src = os.path.join(src, "pytorch_model.bin")
        # one shared dispatch with tools/convert_checkpoints.py (it also
        # strips the HF whisper 'model.' prefix) — the runbook and the
        # offline converter must produce identical msgpacks
        save(kind, convert_checkpoint_tree(kind, load_torch_ckpt(src)))
    return converted


# ---------------------------------------------------------------------------
# Stage 2: predict
# ---------------------------------------------------------------------------


def _fake_text_encoder(ids):
    """Deterministic stand-in when no EVA text weights are supplied."""
    ids = np.asarray(ids)
    return np.stack([np.sin(np.arange(1024) * (1 + int(row.sum()) % 97) / 997.0)
                     for row in ids]).astype(np.float32)


def build_text_encoder(converted: dict):
    if "eva" not in converted:
        log("no EVA weights: using deterministic fake text encoder (dry-run)")
        return _fake_text_encoder

    import jax
    from flax import serialization

    from hirest_tpu.models.eva_clip import EvaTextConfig, EvaTextTower

    cfg = EvaTextConfig()
    tower = EvaTextTower(cfg)
    with open(converted["eva"], "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    params = {"params": tree["text"]}
    fwd = jax.jit(lambda ids: tower.apply(params, ids))

    def encode(ids):
        return np.asarray(fwd(np.asarray(ids, dtype=np.int32)))

    return encode


def _synthesize_features(data_dir: str, out_dir: str, seed: int = 0):
    from hirest_tpu.data.annotations import load_annotations

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        path = os.path.join(data_dir, f"all_data_{split}.json")
        if not os.path.exists(path):
            continue
        for vids in load_annotations(path).values():
            for fname, a in vids.items():
                dst = os.path.join(out_dir, f"{fname}.npy")
                if a["relevant"] and a["clip"] and not os.path.exists(dst):
                    np.save(dst, rng.normal(
                        size=(max(2, round(a["v_duration"])), 1024)
                    ).astype(np.float32))


def _dry_run_data(args, outdir: str) -> str:
    """Tiny annotation slice + synthetic features; returns new data_dir."""
    src = os.path.join(args.data_root, "splits")
    with open(os.path.join(src, "all_data_val.json")) as f:
        anns = json.load(f)
    keys = list(anns)[: args.limit or 2]
    tiny = {k: anns[k] for k in keys}
    data_dir = os.path.join(outdir, "splits")
    os.makedirs(data_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        with open(os.path.join(data_dir, f"all_data_{split}.json"), "w") as f:
            json.dump(tiny, f)
    # a negatives split for VR (reuse the same videos)
    with open(os.path.join(data_dir,
                           "all_data_test_negative_samples.json"), "w") as f:
        json.dump({}, f)
    feat_dir = os.path.join(outdir, "feats")
    _synthesize_features(data_dir, feat_dir)
    args.video_feature_dir = feat_dir

    # matching tiny data_root for the scoring stage: regenerated formatted
    # GT over the slice + the reference category map
    import shutil

    from hirest_tpu.eval.make_gt import build_formatted_gt
    eval_dir = os.path.join(outdir, "evaluation")
    os.makedirs(eval_dir, exist_ok=True)
    with open(os.path.join(eval_dir,
                           "formatted_moment_evaluation_gt.json"), "w") as f:
        json.dump(build_formatted_gt(tiny), f)
    cats = os.path.join(args.data_root, "evaluation", "categories.json")
    if os.path.exists(cats):
        shutil.copy(cats, eval_dir)
    args.data_root = outdir
    return data_dir


def run_predictions(args, converted: dict, outdir: str) -> dict:
    """Joint-model predictions for the three moment tasks + VR scores.
    Returns {task: prediction json path}."""
    from hirest_tpu.config import HirestConfig
    from hirest_tpu.train.trainer import Trainer

    pred_dir = os.path.join(outdir, "predictions")
    os.makedirs(pred_dir, exist_ok=True)

    data_dir = (os.path.join(args.data_root, "splits")
                if not args.dry_run else _dry_run_data(args, outdir))

    cfg = HirestConfig(
        data_dir=data_dir,
        video_feature_dir=args.video_feature_dir,
        asr_feature_dir=args.asr_feature_dir,
        task_moment_retrieval=True, task_moment_segmentation=True,
        task_step_captioning=True, train=False,
        eval_batch_size=args.batch_size, num_beams=3,
        ckpt_dir=os.path.join(outdir, "ckpt"),
        pretrained_dir=args.pretrained_dir or os.path.join(outdir, "none"),
    )

    tokenizer = None
    vocab_path = os.path.join(args.pretrained_dir or "", "vocab.txt")
    if os.path.isfile(vocab_path):
        from hirest_tpu.tokenizers.wordpiece import WordPieceTokenizer
        tokenizer = WordPieceTokenizer(vocab_path)
        log(f"wordpiece vocab: {vocab_path}")
    else:
        log("no vocab.txt in --pretrained_dir: captions decode as raw ids")

    text_encoder = build_text_encoder(converted)
    trainer = Trainer(cfg, text_encoder_fn=text_encoder,
                      wordpiece_tokenizer=tokenizer, verbose=True)

    if args.joint and os.path.exists(args.joint):
        if args.joint.endswith(".pth") or args.joint.endswith(".bin"):
            trainer.load_torch_checkpoint(args.joint)
        else:
            trainer.load(args.joint)
    elif not args.dry_run:
        log("WARNING: no --joint checkpoint; predictions use random init")

    paths = {}
    for task in ("moment_retrieval", "moment_segmentation", "step_captioning"):
        res = trainer.predict(trainer.loaders["val"][task], task)
        path = os.path.join(pred_dir, f"{task}.json")
        with open(path, "w") as f:
            json.dump(res, f, indent=2)
        paths[task] = path
        log(f"predicted {task} -> {path}")

    # video retrieval: precomputed-features path over test + negatives
    from hirest_tpu.infer.retrieval import (encode_texts,
                                            encode_videos_from_features,
                                            load_retrieval_split,
                                            score_and_dump)
    prompts, vids = load_retrieval_split(data_dir, "test")
    neg_path = os.path.join(data_dir, "all_data_test_negative_samples.json")
    if os.path.exists(neg_path):
        _, distractors = load_retrieval_split(data_dir, "test_negative_samples")
        vids = vids + distractors
    text_embeds = encode_texts(text_encoder, prompts, args.batch_size)
    video_embeds = encode_videos_from_features(
        args.video_feature_dir, vids, cfg.n_model_frames)
    score_and_dump(prompts, vids, text_embeds, video_embeds,
                   "validate", save_dir=pred_dir)
    paths["video_retrieval"] = os.path.join(pred_dir, "validate.json")
    return paths


# ---------------------------------------------------------------------------
# Stages 3+4: score + diff
# ---------------------------------------------------------------------------


def score_all(args, pred_paths: dict) -> dict:
    from hirest_tpu.eval import cli

    scores = {}
    for task, path in pred_paths.items():
        argv = ["--task", task, "--pred_data", path,
                "--data_root", args.data_root]
        if task == "video_retrieval":
            argv += ["--gt_data", os.path.join(
                args.data_root, "splits", "all_data_test.json")]
        try:
            scores[task] = cli.main(argv)
        except Exception as e:  # keep the matrix running; report at the end
            log(f"scoring {task} FAILED: {e!r}")
            scores[task] = {"error": repr(e)}
    return scores


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[key] = float(v)
    return out


def diff_scores(ours: dict, reference: dict, tol: float = 0.1):
    """Per-metric |delta| <= tol. Returns (n_pass, n_fail, rows)."""
    rows, n_pass, n_fail = [], 0, 0
    for task, ref_metrics in reference.items():
        flat_ref = _flatten(ref_metrics)
        flat_ours = _flatten(ours.get(task, {}))
        for metric, ref_v in flat_ref.items():
            our_v = flat_ours.get(metric)
            if our_v is None:
                rows.append((task, metric, None, ref_v, "MISSING"))
                n_fail += 1
                continue
            ok = abs(our_v - ref_v) <= tol
            rows.append((task, metric, our_v, ref_v,
                         "pass" if ok else "FAIL"))
            n_pass, n_fail = n_pass + ok, n_fail + (not ok)
    return n_pass, n_fail, rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--joint", help="trained joint ckpt (.pth/.bin/.msgpack)")
    p.add_argument("--eva", help="eva_clip_psz14.pt")
    p.add_argument("--clip4caption", help="clip4caption_vit-b-32_model.bin")
    p.add_argument("--whisper", help="HF whisper small.en dir or .bin")
    p.add_argument("--data_root", default="/root/reference/data")
    p.add_argument("--video_feature_dir")
    p.add_argument("--asr_feature_dir")
    p.add_argument("--pretrained_dir")
    p.add_argument("--reference_scores",
                   help="JSON {task: {metric: value}} from a reference run")
    p.add_argument("--out", default="/tmp/real_weight_validation")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--tolerance", type=float, default=0.1)
    p.add_argument("--limit", type=int, default=0,
                   help="dry-run: number of prompts to keep")
    p.add_argument("--dry-run", action="store_true", dest="dry_run")
    args = p.parse_args(argv)

    if args.dry_run:
        # keep dry-runs off the axon TPU tunnel; the env var alone does not
        # (axon registers regardless) — the config update does
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)

    converted = convert_all(args, os.path.join(args.out, "converted"))
    pred_paths = run_predictions(args, converted, args.out)
    scores = score_all(args, pred_paths)

    with open(os.path.join(args.out, "scores.json"), "w") as f:
        json.dump(scores, f, indent=2, default=float)
    log(f"scores -> {os.path.join(args.out, 'scores.json')}")

    if not args.reference_scores:
        log("no --reference_scores given: stopping after scoring "
            "(supply one to run the 0.1-tolerance diff)")
        return 0

    with open(args.reference_scores) as f:
        reference = json.load(f)
    n_pass, n_fail, rows = diff_scores(scores, reference, args.tolerance)
    width = max((len(f"{t}.{m}") for t, m, *_ in rows), default=20)
    for task, metric, ours, ref, verdict in rows:
        ours_s = "—" if ours is None else f"{ours:.4f}"
        print(f"{task + '.' + metric:<{width}}  ours={ours_s:>8}  "
              f"ref={ref:.4f}  {verdict}")
    print(f"\n{n_pass} pass / {n_fail} fail (tolerance {args.tolerance})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
