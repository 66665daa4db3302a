"""Native featpack library vs the pure-NumPy timeline implementations."""

import numpy as np
import pytest

from hirest_tpu import native
from hirest_tpu import timeline

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native featpack unavailable (no g++)")

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("src_len,n_model", [(100, 20), (10, 20), (20, 20),
                                             (333, 64), (1, 16)])
def test_pack_batch_matches_numpy_resample(src_len, n_model):
    feats = [RNG.normal(size=(src_len, 8)).astype(np.float32) for _ in range(3)]
    out = native.pack_batch(feats, bucket=64, n_model_frames=n_model)
    assert out.shape == (3, 64, 8)
    for i in range(3):
        want = timeline.resample_frames(feats[i], n_model)
        np.testing.assert_array_equal(out[i, :n_model], want)
        assert (out[i, n_model:] == 0).all()


def test_pack_batch_native_length_pads():
    feats = [RNG.normal(size=(t, 4)).astype(np.float32) for t in (10, 30, 25)]
    out = native.pack_batch(feats, bucket=32, n_model_frames=-1)
    for i, f in enumerate(feats):
        np.testing.assert_array_equal(out[i, : f.shape[0]], f)
        assert (out[i, f.shape[0]:] == 0).all()


def test_pack_batch_truncates_to_bucket():
    feats = [RNG.normal(size=(100, 4)).astype(np.float32)]
    out = native.pack_batch(feats, bucket=32, n_model_frames=-1)
    np.testing.assert_array_equal(out[0], feats[0][:32])


def test_warp_segments_matches_numpy():
    segs = RNG.normal(size=(3, 6)).astype(np.float32)
    bounds = [(0, 5), (4, 9), (20, 99)]
    want = timeline.warp_segments(segs, bounds, 30)
    got = native.warp_segments(segs, bounds, 30)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("target", [4, 6, 12])
def test_trim_to_moment_matches_numpy(target):
    feats = RNG.normal(size=(20, 5)).astype(np.float32)
    mask = np.zeros(20, dtype=np.int32)
    mask[3:9] = 1
    want = timeline.trim_to_moment(feats, mask, target)
    got = native.trim_to_moment(feats, mask, target)
    np.testing.assert_array_equal(got, want)
