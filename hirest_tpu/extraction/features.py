"""EVA-CLIP visual feature extraction: frame JPEGs -> per-video features.

Reference surface: extraction/video_features/extract_features.py
(EVA-CLIP-g encode_image over sorted frames, batch-chunked, L2-normalized,
one [n_seconds, 1024] file per video) and check_feature_size.py (truncate
to the rounded duration).

This is the throughput workhorse (BASELINE target: >= 10k frames/sec/chip):
frames stream through a host-side decode/preprocess pool into fixed-size
device batches for the jitted bf16 vision tower; output is .npy.
Multi-process sharding uses the reference's `slice`/stride semantics.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np


def _decode_frame(args):
    """(preprocess_fn, path) -> preprocessed array; module-level so it
    pickles into spawn-context decode workers."""
    from PIL import Image

    preprocess_fn, path = args
    return preprocess_fn(Image.open(path).convert("RGB"))


def iter_video_frame_batches(frame_dir: Path, preprocess_fn: Callable,
                             batch_size: int, pool=None):
    """Yields (frame_batch [n,H,W,3], count) over the sorted frames of one
    video directory, final batch zero-padded to batch_size for one jit shape.

    pool: optional executor (see extract_video_features decode_workers) that
    fans the JPEG decode + resize across processes — PIL holds the GIL, so
    threads don't parallelize it."""
    paths = sorted(frame_dir.glob("frame_*.jpg"))
    for i in range(0, len(paths), batch_size):
        chunk = paths[i: i + batch_size]
        work = [(preprocess_fn, p) for p in chunk]
        if pool is not None:
            imgs = np.stack(list(pool.map(_decode_frame, work, chunksize=8)))
        else:
            imgs = np.stack([_decode_frame(w) for w in work])
        n = len(chunk)
        if n < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n,) + imgs.shape[1:], imgs.dtype)])
        yield imgs, n


def extract_video_features(
    frame_root: str,
    out_dir: str,
    encode_image_fn: Callable,
    preprocess_fn: Callable,
    batch_size: int = 64,
    video_ids: Optional[Sequence[str]] = None,
    normalize: bool = True,
    process_id: int = 0,
    num_processes: int = 1,
    durations: Optional[dict] = None,
    decode_workers: int = 0,
) -> int:
    """Encode every video's frames; writes {video_id}.npy [n_frames, 1024].

    `durations` (video_id -> seconds) truncates features to round(duration)
    — the check_feature_size repair folded into the pipeline.

    The host decode pipeline overlaps the device encode (a background
    thread keeps 2 batches ahead — the single-controller analogue of the
    reference's DataLoader workers, hirest_dataset.py:610-630), and
    `decode_workers > 0` additionally fans the per-frame JPEG decode +
    bicubic resize across that many spawn-context processes.
    """
    from hirest_tpu.data.prefetch import prefetch

    frame_root, out_dir = Path(frame_root), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if video_ids is None:
        video_ids = sorted(d.name for d in frame_root.iterdir() if d.is_dir())
    video_ids = list(video_ids)[process_id::num_processes]

    pool = None
    if decode_workers > 0:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # spawn, not fork: forking after jax/XLA initialization can deadlock
        # on inherited runtime threads; the workers only ever run PIL
        pool = ProcessPoolExecutor(decode_workers,
                                   mp_context=mp.get_context("spawn"))

    n_done = 0
    for vid in video_ids:
        out = out_dir / f"{vid}.npy"
        if out.exists():
            continue
        feats = []
        for imgs, n in prefetch(iter_video_frame_batches(
                frame_root / vid, preprocess_fn, batch_size, pool=pool)):
            emb = np.asarray(encode_image_fn(imgs), dtype=np.float32)[:n]
            feats.append(emb)
        if not feats:
            continue
        feats = np.concatenate(feats, axis=0)
        if normalize:
            feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        if durations and vid in durations:
            feats = feats[: round(durations[vid])]
        np.save(out, feats)
        n_done += 1
    if pool is not None:
        pool.shutdown()
    return n_done


def make_eva_encoder(pretrained_dir: str = "./pretrained_weights",
                     dtype_name: str = "bfloat16", use_pallas: bool = True,
                     padded_heads: bool = False, scan: bool = True,
                     int8: bool = False, uint8_frontend: bool = False):
    """Build (encode_image_fn, preprocess_fn) around the jitted EVA vision
    tower, loading converted weights when available.

    Production defaults (measured fastest, BENCHLOG.md): scan-over-layers
    forward (one-block compile: seconds instead of minutes per shape) with
    the v3 batched-heads Pallas attention kernel (283.1 fps vs 272.7 for
    the v1 fused-qkv kernel, measured on-chip 2026-08-18) at the NATIVE
    head width 88 — the 88->128 padding transform costs +15% FLOPs and is
    opt-in.
    `int8=True` selects the quantized throughput mode (weights per-channel,
    activations per-row dynamic).
    `uint8_frontend=True` (scan path) ships RAW uint8 frames to the device
    and runs pixel normalization inside the patch-embed matmul
    (eva_scan.fold_uint8_frontend): 4x less host->device image traffic and
    no host float math — worthwhile whenever frames stream per batch."""
    import jax
    import jax.numpy as jnp

    from hirest_tpu.config import EvaVisionConfig
    from hirest_tpu.models.eva_clip import (EvaVisionTower, preprocess_image,
                                            preprocess_image_u8)
    from hirest_tpu.utils.init import shape_only_init

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    cfg = EvaVisionConfig()
    ckpt = os.path.join(pretrained_dir, "eva_clip_psz14.pt")
    if os.path.exists(ckpt):
        from hirest_tpu.models.convert import convert_eva_vision, load_torch_ckpt

        params = {"params": convert_eva_vision(load_torch_ckpt(ckpt))}
        print(f"Loaded EVA-CLIP vision tower from {ckpt}")
    else:
        params = shape_only_init(EvaVisionTower(cfg),
                                 jnp.zeros((1, 224, 224, 3), jnp.float32))
        print(f"WARNING: {ckpt} not found - vision tower is random-init")
    if padded_heads:
        from hirest_tpu.models.eva_pad import pad_vision_head_params

        params, cfg = pad_vision_head_params(params, cfg)

    if scan:
        from hirest_tpu.models.eva_scan import build_scanned_vision_apply

        # measured-best production configs (on-chip 2026-08-18/19, BENCHLOG):
        # bf16 -> v3 batched-heads 3D trunk (283.1 fps vs 272.7 v1);
        # int8 -> fused-quant + v3 + flat + token padding + fused MLP
        # (412.4 fps vs 334.1 unpadded-unfused / 279.2 dyn-quant; the
        # 257 -> 264 token pad makes the flat<->3D attention reshapes true
        # bitcasts, and the one-kernel MLP keeps the [., 6144] hidden
        # activation in VMEM). Kernel flags are inert when use_pallas is
        # off (the packed guard falls back to XLA).
        apply = build_scanned_vision_apply(params, cfg, int8=int8,
                                           use_pallas=use_pallas, dtype=dtype,
                                           attn_v3=use_pallas,
                                           fused_quant=int8 and use_pallas,
                                           flat2d=int8 and use_pallas,
                                           pad_tokens=int8 and use_pallas,
                                           fused_mlp=int8 and use_pallas,
                                           uint8_input=uint8_frontend)
        if uint8_frontend:
            # raw bytes cross the host->device boundary; the cast to the
            # compute dtype happens on-device inside the jitted forward
            return (lambda im: apply(jnp.asarray(im))), preprocess_image_u8
        return (lambda im: apply(jnp.asarray(im, dtype))), preprocess_image

    tower = EvaVisionTower(cfg, dtype=dtype, use_pallas=use_pallas)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    jitted = jax.jit(lambda p, im: tower.apply(p, im))
    return (lambda im: jitted(params, jnp.asarray(im, dtype))), preprocess_image


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--frame_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--pretrained_dir", default="./pretrained_weights")
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="quantized throughput mode for the frozen tower")
    p.add_argument("--uint8_frontend", action="store_true",
                   help="ship raw uint8 frames; normalization folded into "
                        "the patch embed (4x less host->device traffic)")
    p.add_argument("--decode_workers", type=int, default=0,
                   help="JPEG decode/resize worker processes (0 = in-line)")
    a = p.parse_args()
    enc, pre = make_eva_encoder(a.pretrained_dir,
                                use_pallas=not a.no_pallas, int8=a.int8,
                                uint8_frontend=a.uint8_frontend)
    n = extract_video_features(a.frame_dir, a.out_dir, enc, pre, a.batch_size,
                               process_id=a.process_id,
                               num_processes=a.num_processes,
                               decode_workers=a.decode_workers)
    print(f"encoded {n} videos")
