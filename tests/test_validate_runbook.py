"""Unit tests for the real-weight validation runbook
(tools/validate_real_weights.py). The full --dry-run pipeline (convert ->
predict -> score -> diff) is exercised manually / by the runbook itself; here
we pin the pure pieces: score flattening and the 0.1-tolerance diff."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_real_weights import _flatten, diff_scores  # noqa: E402


def test_flatten_nested_scores():
    flat = _flatten({"all": {"R@1": 1.0, "sub": {"x": 2}},
                     "n": 3, "name": "str-ignored", "ok": True})
    assert flat == {"all.R@1": 1.0, "all.sub.x": 2.0, "n": 3.0}


def test_diff_scores_tolerance_and_missing():
    ours = {"moment_retrieval": {"all": {"R@0.5": 40.05, "R@0.7": 25.0}},
            "video_retrieval": {"all": {"R@1": 10.0}}}
    ref = {"moment_retrieval": {"all": {"R@0.5": 40.0,    # within 0.1
                                        "R@0.7": 25.2}},  # out of tolerance
           "video_retrieval": {"all": {"R@1": 10.0,       # exact
                                       "R@5": 50.0}}}     # missing in ours
    n_pass, n_fail, rows = diff_scores(ours, ref, tol=0.1)
    assert (n_pass, n_fail) == (2, 2)
    verdicts = {f"{t}.{m}": v for t, m, _, _, v in rows}
    assert verdicts["moment_retrieval.all.R@0.5"] == "pass"
    assert verdicts["moment_retrieval.all.R@0.7"] == "FAIL"
    assert verdicts["video_retrieval.all.R@1"] == "pass"
    assert verdicts["video_retrieval.all.R@5"] == "MISSING"
