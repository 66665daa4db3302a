import numpy as np
import pytest

from hirest_tpu import timeline


def test_bins_match_reference_example():
    # Reference docstring example: duration 200, n_frames 32
    bins = timeline.timeline_bins(200, 32)
    assert bins.shape == (32,)
    assert bins[0] == 0.0
    assert bins[-1] == 199.0
    np.testing.assert_allclose(bins[1], 6.41935484, rtol=1e-6)


@pytest.mark.parametrize("duration,n_frames", [(200, 32), (207.08, -1), (61, 20), (5, 5)])
def test_timestamp_roundtrip_monotone(duration, n_frames):
    n = int(duration) if n_frames < 0 else n_frames
    idxs = [timeline.timestamp_to_frame_index(t, duration, n_frames) for t in range(int(duration))]
    assert all(0 <= i < n for i in idxs)
    assert idxs == sorted(idxs)
    ts = [timeline.frame_index_to_timestamp(i, duration, n_frames) for i in range(n)]
    assert ts == sorted(ts)
    assert all(isinstance(t, int) for t in ts)


def test_timestamp_to_frame_digitize_right_convention():
    # bins for duration=10, n=10 are [0..9]; right=True puts t exactly on a bin
    # edge into that bin's index.
    assert timeline.timestamp_to_frame_index(0, 10, 10) == 0
    assert timeline.timestamp_to_frame_index(0.5, 10, 10) == 1
    assert timeline.timestamp_to_frame_index(9, 10, 10) == 9
    # Clamp beyond the last edge
    assert timeline.timestamp_to_frame_index(100, 10, 10) == 9


def test_native_length_binning_is_identity_like():
    # n_frames=-1 -> one bin per second, bins are 0..dur-1 so integer
    # timestamps map to themselves.
    for t in range(60):
        assert timeline.timestamp_to_frame_index(t, 60, -1) == t
        assert timeline.frame_index_to_timestamp(t, 60, -1) == t


def _reference_count_embeds_upsample(src: np.ndarray, n_target: int) -> np.ndarray:
    """Independent re-derivation of the reference's nested-list upsampling
    (hirest_dataset.py:342-354) used as a golden oracle."""
    N = src.shape[0]
    out = np.zeros((n_target, src.shape[1]), dtype=src.dtype)
    slots = [0] * n_target
    groups = [slots[(j * n_target) // N: ((j + 1) * n_target) // N] for j in range(N)]
    j = 0
    for k, group in enumerate(groups):
        for _ in group:
            out[j] = src[k]
            j += 1
    assert j == n_target
    return out


@pytest.mark.parametrize("n_source,n_target", [(3, 20), (7, 20), (20, 20), (1, 5), (19, 20)])
def test_repeat_upsample_matches_reference(n_source, n_target):
    rng = np.random.default_rng(0)
    src = rng.normal(size=(n_source, 4)).astype(np.float32)
    got = timeline.resample_frames(src, n_target)
    want = _reference_count_embeds_upsample(src, n_target)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (n_target, 4)


def test_subsample_linspace():
    src = np.arange(100, dtype=np.float32).reshape(100, 1)
    got = timeline.resample_frames(src, 10)
    want_ids = np.linspace(0, 99, 10).astype(int)
    np.testing.assert_array_equal(got[:, 0], want_ids.astype(np.float32))


def test_warp_segments():
    feats = np.array([[1.0, 1.0], [2.0, 2.0]], dtype=np.float32)
    warped = timeline.warp_segments(feats, [(1, 3), (2, 5)], 6)
    # second segment overwrites overlap at t=2
    np.testing.assert_array_equal(warped[:, 0], [0, 1, 2, 2, 2, 0])


def test_warp_segments_clamps_out_of_range():
    feats = np.ones((1, 2), dtype=np.float32)
    warped = timeline.warp_segments(feats, [(4, 99)], 6)
    np.testing.assert_array_equal(warped[:, 0], [0, 0, 0, 0, 1, 1])


def test_trim_to_moment_truncates_and_upsamples():
    feats = np.arange(10, dtype=np.float32).reshape(10, 1)
    mask = np.zeros(10, dtype=np.int64)
    mask[2:8] = 1  # 6 moment frames: values 2..7

    out = timeline.trim_to_moment(feats, mask, 4)  # truncate to first 4
    np.testing.assert_array_equal(out[:, 0], [2, 3, 4, 5])

    out = timeline.trim_to_moment(feats, mask, 12)  # upsample 6 -> 12
    want = _reference_count_embeds_upsample(feats[2:8], 12)
    np.testing.assert_array_equal(out, want)

    out = timeline.trim_to_moment(feats, mask, 6)  # exact
    np.testing.assert_array_equal(out[:, 0], [2, 3, 4, 5, 6, 7])
