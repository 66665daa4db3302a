"""Prediction-JSON formatting (run.py:704-838 parity behaviors)."""

from hirest_tpu.train.formatting import (
    format_moment_retrieval,
    format_moment_segmentation,
    format_step_captioning,
)


def test_format_moment_retrieval():
    out = format_moment_retrieval(
        prompts=["p1", "p1"], video_fnames=["a.mp4", "b.mp4"],
        video_durations=[100, 60], predictions=[[10, 50], [5, 59]],
        n_model_frames=-1, targets=[[11, 49], [6, 58]], loss=0.5)
    assert out["p1"]["a.mp4"]["bounds"] == [10, 50]
    assert out["p1"]["a.mp4"]["video_duration"] == 100
    assert out["p1"]["b.mp4"]["target_bounds"] == [6, 58]
    assert out["loss"] == 0.5


def test_format_moment_retrieval_binned():
    # with n_model_frames=32, frame indices convert through the bin edges
    out = format_moment_retrieval(["p"], ["v.mp4"], [200], [[8, 31]], 32)
    assert out["p"]["v.mp4"]["bounds"] == [51, 199]  # bins of duration 200


def test_format_moment_segmentation_consecutive_pairs():
    out = format_moment_segmentation(
        video_fnames=["v.mp4"], video_durations=[100],
        predictions=[[10, 20, 35, 80]], n_model_frames=-1,
        targets=[[10, 22, 35, 80]])
    e = out["v.mp4"]
    assert e["bounds"] == [[10, 20], [20, 35], [35, 80]]
    assert e["pred_bounds"] == [10, 20, 35, 80]
    assert e["target_bounds"] == [10, 22, 35, 80]


def test_format_moment_segmentation_out_of_range_bound():
    # out-of-range index prints a warning and appends a short bound (reference
    # run.py:766-774 swallows the conversion error)
    out = format_moment_segmentation(["v.mp4"], [50], [[10, 999]], -1, [[10]])
    assert out["v.mp4"]["bounds"] == [[10]]  # second edge failed to convert


def test_format_step_captioning_groups_by_video():
    out = format_step_captioning(
        video_fnames=["v.mp4", "v.mp4", "w.mp4"], video_durations=[30, 30, 40],
        predictions=["step one", "step two", "other"],
        targets=["gt one", "gt two", "gt other"])
    assert [c["sentence"] for c in out["v.mp4"]["captions"]] == ["step one", "step two"]
    assert out["v.mp4"]["target_captions"] == ["gt one", "gt two"]
    assert out["w.mp4"]["captions"] == [{"sentence": "other"}]
