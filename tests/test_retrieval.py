"""Video-retrieval inference flow on synthetic features + real split JSONs."""

import json
import os

import numpy as np
import pytest

from hirest_tpu.infer.retrieval import (
    encode_texts,
    encode_videos_from_features,
    load_retrieval_split,
    score_and_dump,
)

SPLITS = "/root/reference/data/splits"
requires_data = pytest.mark.skipif(not os.path.exists(SPLITS),
                                   reason="reference data not mounted")


@requires_data
def test_load_retrieval_split_counts():
    prompts, videos = load_retrieval_split(SPLITS, "test")
    assert len(prompts) == 546
    assert len(videos) == 1391
    _, distractors = load_retrieval_split(SPLITS, "test_negative_samples")
    assert len(distractors) == 2891


def test_retrieval_scoring_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vids = [f"v{i}.mp4" for i in range(6)]
    fdir = tmp_path / "feats"
    fdir.mkdir()
    # construct features so that v0 matches prompt 0 exactly
    base = rng.normal(size=(3, 1024)).astype(np.float32)
    for i, v in enumerate(vids):
        feats = np.tile(base[i % 3], (20, 1))
        np.save(fdir / f"{v}.npy", feats)

    def fake_text_encoder(ids):
        return base[np.asarray(ids)[:, 1] % 3]

    prompts = ["alpha", "beta"]
    text_embeds = encode_texts(fake_text_encoder, prompts)
    video_embeds = encode_videos_from_features(str(fdir), vids, n_model_frames=8)
    assert video_embeds.shape == (6, 1024)
    np.testing.assert_allclose(np.linalg.norm(video_embeds, axis=1), 1.0, rtol=1e-5)

    results = score_and_dump(prompts, vids, text_embeds, video_embeds,
                             "test_run", save_dir=str(tmp_path / "VR_results"))
    assert os.path.exists(tmp_path / "VR_results" / "test_run.json")
    with open(tmp_path / "VR_results" / "test_run.json") as f:
        loaded = json.load(f)
    assert loaded["alpha"]["videos"] == vids
    assert len(loaded["alpha"]["scores"]) == 6

    # feed straight into the evaluator
    from hirest_tpu.eval.metrics import evaluate_video_retrieval

    gt = {"alpha": {vids[0]: {}}, "beta": {vids[1]: {}}}
    res = evaluate_video_retrieval(gt, loaded, ks=(1, 3))
    assert "R@1" in res["all"]


def test_upsample_linspace_semantics(tmp_path):
    # The VR path repeats frames via linspace when the video is SHORTER than
    # n_model_frames (unconditional linspace, unlike the training resampler).
    fdir = tmp_path
    # one-hot rows: the repeat COUNTS become the mean-pool direction, so a
    # wrong upsample (zero-pad, truncate, equal-repeat) changes the
    # normalized embedding — a constant-direction construction would
    # normalize any scalar error away
    feats = np.eye(4, 8, dtype=np.float32)
    np.save(fdir / "x.mp4.npy", feats)
    emb = encode_videos_from_features(str(fdir), ["x.mp4"], n_model_frames=8)
    assert emb.shape == (1, 8)
    # linspace(0,3,8).astype(int) = [0,0,0,1,1,2,2,3] -> counts [3,2,2,1]
    expect = np.array([3, 2, 2, 1, 0, 0, 0, 0], np.float32)
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(emb[0], expect, rtol=1e-5, atol=1e-6)


def test_encode_videos_from_frames(tmp_path):
    """Raw-frame path (prefetch-overlapped): linspace frame subsample,
    batch encode, mean-pool + L2-normalize, optional per-video save."""
    import numpy as np
    from PIL import Image

    from hirest_tpu.infer.retrieval import encode_videos_from_frames

    rng = np.random.default_rng(0)
    for vid, n in (("vidA", 9), ("vidB", 3)):
        d = tmp_path / "frames" / vid
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                            ).save(d / f"frame_{i:05d}.jpg")

    pre = lambda img: np.asarray(img, np.float32) / 255.0  # noqa: E731
    enc = lambda im: np.asarray(im, np.float32).reshape(len(im), -1)[:, :8]  # noqa: E731
    out = encode_videos_from_frames(
        str(tmp_path / "frames"), ["vidA", "vidB"], enc, pre,
        n_model_frames=4, batch_size=3,
        save_feature_dir=str(tmp_path / "saved"))
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    saved = np.load(tmp_path / "saved" / "vidA.npy")
    assert saved.shape == (4, 8)  # n_model_frames rows, pre-pool
