"""extract_video_features host pipeline: batching/padding, duration
truncation, idempotent resume, and the prefetch + decode-worker paths
producing bit-identical output to the serial loop.

Reference surface: extraction/video_features/extract_features.py (sorted
frames, batch-chunked encode, L2-normalize, truncate to duration) +
check_feature_size.py.
"""

import numpy as np
import pytest

from hirest_tpu.extraction.features import (extract_video_features,
                                            iter_video_frame_batches)


def _write_frames(root, vid, n, seed=0):
    from PIL import Image

    d = root / vid
    d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
                        ).save(d / f"frame_{i:05d}.jpg")
    return d


def _pre(img):
    # tiny stand-in preprocess: center 16x16 crop as float32
    a = np.asarray(img, dtype=np.float32)
    return a[8:24, 16:32] / 255.0


def _enc(imgs):
    # deterministic stand-in encoder: per-frame channel means + pixel sum
    b = np.asarray(imgs, dtype=np.float32)
    return np.stack([b.mean((1, 2, 3)), b[:, :, :, 0].mean((1, 2)),
                     b[:, :, :, 1].mean((1, 2)), b.sum((1, 2, 3))], -1)


def test_batch_iter_pads_final_batch(tmp_path):
    d = _write_frames(tmp_path, "v1", 5)
    batches = list(iter_video_frame_batches(d, _pre, batch_size=4))
    assert [n for _, n in batches] == [4, 1]
    assert batches[1][0].shape[0] == 4  # zero-padded to the jit shape
    assert np.all(batches[1][0][1:] == 0)


def test_extract_truncates_normalizes_and_resumes(tmp_path):
    _write_frames(tmp_path / "frames", "v1", 7)
    out = tmp_path / "out"
    n = extract_video_features(str(tmp_path / "frames"), str(out), _enc, _pre,
                               batch_size=4, durations={"v1": 5})
    f = np.load(out / "v1.npy")
    assert n == 1 and f.shape == (5, 4)
    np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-5)
    # existing outputs are skipped (idempotent resume)
    assert extract_video_features(str(tmp_path / "frames"), str(out), _enc,
                                  _pre, batch_size=4) == 0


@pytest.mark.slow
def test_decode_workers_match_serial(tmp_path):
    _write_frames(tmp_path / "frames", "v1", 6, seed=3)
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    extract_video_features(str(tmp_path / "frames"), str(out_a), _enc, _pre,
                           batch_size=4)
    extract_video_features(str(tmp_path / "frames"), str(out_b), _enc, _pre,
                           batch_size=4, decode_workers=2)
    np.testing.assert_array_equal(np.load(out_a / "v1.npy"),
                                  np.load(out_b / "v1.npy"))
