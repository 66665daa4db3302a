import numpy as np
import pytest

from hirest_tpu.eval.metrics import (
    Categories,
    compute_iou,
    compute_step_bound_scores,
    evaluate_moment_retrieval,
    evaluate_video_retrieval,
    nms_1d,
    preprocess_moment_bounds,
)


def test_compute_iou_basic():
    assert compute_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert compute_iou([0, 10], [5, 15]) == pytest.approx(5 / 15, abs=1e-6)
    assert compute_iou([0, 10], [20, 30]) == 0.0
    # nested intervals: the reference union formula is min(span, len1+len2)
    assert compute_iou([0, 10], [2, 4]) == pytest.approx(2 / 10, abs=1e-6)


def test_video_retrieval_recall():
    gt = {"p1": {"v1.mp4": {}}, "p2": {"v9.mp4": {}}}
    pred = {
        "p1": {"videos": ["v1.mp4", "v2.mp4", "v3.mp4"], "scores": [0.9, 0.5, 0.1]},
        "p2": {"videos": ["v1.mp4", "v2.mp4", "v9.mp4"], "scores": [0.9, 0.5, 0.1]},
    }
    res = evaluate_video_retrieval(gt, pred, ks=(1, 2, 3))
    assert res["all"]["R@1"] == 50.0   # p1 hit at rank 1, p2 not
    assert res["all"]["R@3"] == 100.0
    assert res["all"]["total_prompt_count"] == 2


def test_video_retrieval_tie_order_matches_reference():
    # With tied scores, the reference sorts (score, video) ascending then
    # reverses: the lexicographically largest video name ranks first.
    gt = {"p": {"a.mp4": {}}}
    pred = {"p": {"videos": ["a.mp4", "z.mp4"], "scores": [0.5, 0.5]}}
    res = evaluate_video_retrieval(gt, pred, ks=(1,))
    assert res["all"]["R@1"] == 0.0  # z.mp4 outranks a.mp4 on tie


def test_moment_retrieval():
    gt = {"p": {"v": {"clip": True, "bounds": [10, 20]},
                "w": {"clip": False, "bounds": [0, 5]}}}
    pred = {"p": {"v": {"bounds": [10, 19]}, "w": {"bounds": [99, 100]}}}
    res = evaluate_moment_retrieval(gt, pred)
    # IoU = 9/10 -> passes both thresholds; non-clip video excluded
    assert res["all"]["R@0.5"] == 100.0
    assert res["all"]["R@0.7"] == 100.0
    assert res["all"]["total_videos"] == 1


def test_step_bound_scores():
    gt = {"v": {"bounds": [[0, 10], [10, 20]]}}
    pred = {"v": {"bounds": [[0, 10], [50, 60]]}}
    res = compute_step_bound_scores(gt, pred)
    assert res["all"]["recall"]["0.5"] == 50.0     # 1 of 2 refs covered
    assert res["all"]["precision"]["0.5"] == 50.0  # 1 of 2 preds covered
    assert res["all"]["total"] == 1


def test_nms_1d_suppresses_overlaps_keeps_last_first():
    # Reference picks the LAST listed interval first (stable argsort of
    # constant y2), suppressing earlier overlapping ones.
    intervals = np.array([[0, 10], [1, 9], [20, 30]], dtype=float)
    kept = nms_1d(intervals)
    starts = sorted(kept[:, 0].tolist())
    assert starts == [1.0, 20.0]  # [0,10] suppressed by later [1,9]


def test_nms_1d_empty():
    assert nms_1d(np.zeros((0, 2))).shape == (0, 2)


def test_preprocess_moment_bounds_tiles_moment():
    gt = {"v": {"bounds": [[10, 20], [20, 40]]}}  # moment span [10, 40]
    pred = {"v": {"bounds": [[12, 18], [25, 30], [5, 9], [41, 50]]}}
    out = preprocess_moment_bounds(gt, pred)
    b = out["v"]["bounds"]
    # Segments must tile [10, 40] contiguously
    assert b[0][0] == 10 and b[-1][1] == 40
    for i in range(len(b) - 1):
        assert b[i][1] == b[i + 1][0]
    # original in-moment bounds preserved
    assert [12, 18] in [list(map(int, x)) for x in b]


def test_preprocess_moment_bounds_no_valid_preds():
    gt = {"v": {"bounds": [[10, 20]]}}
    pred = {"v": {"bounds": [[0, 5]]}}
    out = preprocess_moment_bounds(gt, pred)
    assert out["v"]["bounds"] == [[10, 20]]


def test_categories_routing():
    cats = Categories(prompt_to_cat={"p1": "Cooking"}, video_to_cat={"v": "Cooking"})
    gt = {"p1": {"v": {"clip": True, "bounds": [0, 10]}}}
    pred = {"p1": {"v": {"bounds": [0, 10]}}}
    res = evaluate_moment_retrieval(gt, pred, cats)
    assert res["Cooking"]["R@0.5"] == 100.0
    assert res["all"]["R@0.5"] == 100.0


def test_step_bound_scores_empty_prediction_rows():
    """A video with an empty predicted bounds list scores precision 0.0
    instead of ZeroDivisionError (the reference divides by a leaked loop
    variable there; 0.0 is its non-crashing reading)."""
    gt = {"v1": {"bounds": [[0, 5], [5, 10]]}, "v2": {"bounds": [[0, 4]]}}
    pred = {"v1": {"bounds": []}, "v2": {"bounds": [[0, 4]]}}
    res = compute_step_bound_scores(gt, pred)
    for tiou, v in res["all"]["precision"].items():
        assert v == pytest.approx(50.0), tiou
    for tiou, v in res["all"]["recall"].items():
        assert v == pytest.approx(50.0), tiou
