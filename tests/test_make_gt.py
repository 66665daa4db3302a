"""Golden-file test: the GT builder must byte-reproduce the reference's
shipped val_testing formatted GT from the raw annotations."""

import json
import os

import pytest

from hirest_tpu.eval.make_gt import build_formatted_gt

VAL_TESTING = "/root/reference/data/val_testing"
requires_data = pytest.mark.skipif(not os.path.exists(VAL_TESTING),
                                   reason="reference data not mounted")


@requires_data
def test_reproduces_shipped_val_testing_gt():
    with open(f"{VAL_TESTING}/all_data_test.json") as f:
        anns = json.load(f)
    with open(f"{VAL_TESTING}/formated_moment_evaluation_gt.json") as f:
        want = json.load(f)
    got = build_formatted_gt(anns)
    assert set(got) == set(want)
    mismatches = [v for v in want if got[v] != want[v]]
    assert mismatches == [], mismatches[:3]


@requires_data
def test_oracle_predictions_score_perfectly():
    with open(f"{VAL_TESTING}/formated_moment_evaluation_gt.json") as f:
        gt = json.load(f)
    from hirest_tpu.eval.metrics import compute_step_bound_scores

    pred = {v: {"bounds": gt[v]["bounds"]} for v in gt}
    res = compute_step_bound_scores(gt, pred)
    assert res["all"]["recall"]["0.5"] > 99.0
    assert res["all"]["precision"]["0.5"] > 99.0
