"""Cross-validation of our evaluators against /root/reference/evaluate.py.

The reference module's only heavy top-level import is `language_evaluation`
(evaluate.py:2); stubbing it in sys.modules makes the VR/MR/MS evaluators and
`preprocess_moment_bounds` (evaluate.py:33-412) importable as a direct
oracle. Category maps are module globals set by its __main__ block
(evaluate.py:444-461), so we inject them the same way after import.

Runs on (i) synthetic prediction JSONs engineered for ties and threshold
edges, and (ii) the real test-split annotations with deterministic
pseudo-predictions — identical inputs through both implementations, outputs
compared to 1e-9.
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

REF_EVAL = "/root/reference/evaluate.py"
REF_TEST_SPLIT = "/root/reference/data/splits/all_data_test.json"
REF_MOMENT_GT = "/root/reference/data/evaluation/formatted_moment_evaluation_gt.json"
REF_CATEGORIES = "/root/reference/data/evaluation/categories.json"

from hirest_tpu.eval import metrics as ours


@pytest.fixture(scope="module")
def ref():
    """Import the reference evaluator with language_evaluation stubbed."""
    if "language_evaluation" not in sys.modules:
        stub = types.ModuleType("language_evaluation")
        stub.CocoEvaluator = object
        sys.modules["language_evaluation"] = stub
    spec = importlib.util.spec_from_file_location("ref_evaluate", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _set_ref_categories(ref, prompt_to_cat, video_to_cat):
    cats = set(prompt_to_cat.values()) | set(video_to_cat.values())
    ref.PROMPT_TO_CAT = prompt_to_cat
    ref.VIDEOS_TO_CAT = video_to_cat
    ref.PROMPT_CATEGORIES = list(cats) + ["all"]


def _assert_close(a, b, path=""):
    assert type(a) is type(b) or (isinstance(a, (int, float)) and
                                  isinstance(b, (int, float))), (path, a, b)
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_close(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), (path, len(a), len(b))
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_close(x, y, f"{path}[{i}]")
    elif isinstance(a, (int, float, np.floating)):
        assert abs(float(a) - float(b)) < 1e-9, (path, a, b)
    else:
        assert a == b, (path, a, b)


# ---------------------------------------------------------------------------
# Synthetic edge-case data
# ---------------------------------------------------------------------------


def _synth_vr():
    gt = {
        "p tied scores": {"a.mp4": {}, "b.mp4": {}},
        "p no hit": {"z.mp4": {}},
        "p hit at 50": {"deep.mp4": {}},
    }
    pool = [f"v{i:03d}.mp4" for i in range(60)]
    pred = {
        # duplicate scores force the sorted(zip(...)) tie-break on names
        "p tied scores": {"videos": ["b.mp4", "c.mp4", "a.mp4", "d.mp4"],
                          "scores": [0.5, 0.5, 0.5, 0.9]},
        "p no hit": {"videos": pool[:10], "scores": list(np.linspace(0, 1, 10))},
        "p hit at 50": {"videos": pool[:49] + ["deep.mp4"],
                        "scores": list(np.linspace(1, 0, 50))},
    }
    p2c = {"p tied scores": "catA", "p no hit": "catA", "p hit at 50": "catB"}
    return gt, pred, p2c


def _synth_mr():
    gt = {
        "p1": {
            "v1.mp4": {"clip": True, "bounds": [0, 10]},
            "v2.mp4": {"clip": False, "bounds": [0, 10]},   # skipped
            "v3.mp4": {"clip": True, "bounds": [20, 60]},
        },
        "p2": {"v4.mp4": {"clip": True, "bounds": [5, 25]}},
    }
    pred = {
        "p1": {
            "v1.mp4": {"bounds": [0, 5]},        # IoU exactly 0.5 minus eps
            "v2.mp4": {"bounds": [0, 0]},
            "v3.mp4": {"bounds": [20, 60]},      # IoU 1.0
        },
        "p2": {"v4.mp4": {"bounds": [11, 25]}},  # IoU 0.7 boundary
    }
    p2c = {"p1": "catA", "p2": "catB"}
    return gt, pred, p2c


def _synth_ms():
    gt = {
        "v1.mp4": {"bounds": [[0, 10], [10, 20], [20, 30]]},
        "v2.mp4": {"bounds": [[0, 50]]},
    }
    pred = {
        "v1.mp4": {"bounds": [[0, 9], [9, 21], [22, 30]]},
        "v2.mp4": {"bounds": [[0, 20], [20, 50]]},
    }
    v2c = {"v1.mp4": "catA", "v2.mp4": "catB"}
    return gt, pred, v2c


def _synth_pre():
    gt = {
        "v1.mp4": {"bounds": [[5, 10], [10, 40]]},
        "v2.mp4": {"bounds": [[0, 30]]},
        "v3.mp4": {"bounds": [[2, 8]]},
    }
    pred = {
        # overlapping chain (NMS pick order), bounds touching the moment edges
        # (strict > and < filters), and out-of-moment bounds
        "v1.mp4": {"bounds": [[6, 12], [11, 20], [12, 21], [5, 9], [39, 41], [7, 39.5]]},
        # everything filtered out -> single [min,max] fallback
        "v2.mp4": {"bounds": [[0, 30], [-5, 2], [29, 31]]},
        "v3.mp4": {"bounds": [[3, 4], [5, 6], [6.5, 7.5]]},
    }
    return gt, pred


def test_video_retrieval_matches_reference_synthetic(ref):
    gt, pred, p2c = _synth_vr()
    _set_ref_categories(ref, p2c, {})
    expected = ref.evaluate_video_retrieval(gt, json.loads(json.dumps(pred)))
    got = ours.evaluate_video_retrieval(
        gt, pred, ours.Categories(prompt_to_cat=p2c))
    _assert_close(got, expected)


def test_moment_retrieval_matches_reference_synthetic(ref):
    gt, pred, p2c = _synth_mr()
    _set_ref_categories(ref, p2c, {})
    expected = ref.evaluate_moment_retrieval(gt, json.loads(json.dumps(pred)))
    got = ours.evaluate_moment_retrieval(
        gt, pred, ours.Categories(prompt_to_cat=p2c))
    _assert_close(got, expected)


def test_step_bounds_match_reference_synthetic(ref):
    gt, pred, v2c = _synth_ms()
    _set_ref_categories(ref, {}, v2c)
    expected = ref.compute_step_bound_scores(gt, json.loads(json.dumps(pred)))
    got = ours.compute_step_bound_scores(
        gt, pred, ours.Categories(video_to_cat=v2c))
    _assert_close(got, expected)


def test_preprocess_moment_bounds_matches_reference_synthetic(ref):
    gt, pred = _synth_pre()
    expected = ref.preprocess_moment_bounds(gt, json.loads(json.dumps(pred)))
    got = ours.preprocess_moment_bounds(gt, json.loads(json.dumps(pred)))
    exp_bounds = {v: [[float(a), float(b)] for a, b in expected[v]["bounds"]]
                  for v in expected}
    got_bounds = {v: [[float(a), float(b)] for a, b in got[v]["bounds"]]
                  for v in got}
    _assert_close(got_bounds, exp_bounds)


# ---------------------------------------------------------------------------
# Real test-split annotations + deterministic pseudo-predictions
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def real_cats():
    with open(REF_CATEGORIES) as f:
        return json.load(f)


def test_video_retrieval_matches_reference_real(ref, real_cats):
    with open(REF_TEST_SPLIT) as f:
        gt = json.load(f)
    all_videos = sorted({v for vids in gt.values() for v in vids})
    rng = np.random.default_rng(0)
    pred = {}
    for prompt, vids in gt.items():
        cands = list(vids) + list(rng.choice(all_videos, size=60, replace=False))
        # quantized scores create real ties across candidates
        scores = np.round(rng.random(len(cands)), 2).tolist()
        pred[prompt] = {"videos": cands, "scores": scores}
    _set_ref_categories(ref, real_cats["prompt_to_cat"], real_cats["video_to_cat"])
    expected = ref.evaluate_video_retrieval(gt, json.loads(json.dumps(pred)))
    got = ours.evaluate_video_retrieval(
        gt, pred, ours.Categories(real_cats["prompt_to_cat"],
                                  real_cats["video_to_cat"]))
    _assert_close(got, expected)


def test_moment_retrieval_matches_reference_real(ref, real_cats):
    with open(REF_TEST_SPLIT) as f:
        gt = json.load(f)
    rng = np.random.default_rng(1)
    pred = {}
    for prompt, vids in gt.items():
        pred[prompt] = {}
        for v, ann in vids.items():
            b = ann.get("bounds") or [0, 1]
            jit = rng.normal(scale=(b[1] - b[0] + 1) * 0.2, size=2)
            pred[prompt][v] = {"bounds": [b[0] + jit[0], b[1] + jit[1]]}
    _set_ref_categories(ref, real_cats["prompt_to_cat"], real_cats["video_to_cat"])
    expected = ref.evaluate_moment_retrieval(gt, json.loads(json.dumps(pred)))
    got = ours.evaluate_moment_retrieval(
        gt, pred, ours.Categories(real_cats["prompt_to_cat"],
                                  real_cats["video_to_cat"]))
    _assert_close(got, expected)


def test_step_bounds_and_preprocess_match_reference_real(ref, real_cats):
    with open(REF_MOMENT_GT) as f:
        gt = json.load(f)
    rng = np.random.default_rng(2)
    pred = {}
    for v, ann in gt.items():
        bs = []
        for s, e in ann["bounds"]:
            jit = rng.normal(scale=max(1.0, (e - s) * 0.3), size=2)
            bs.append([s + jit[0], e + jit[1]])
        if rng.random() < 0.3 and bs:
            bs.append(list(bs[0]))  # duplicates exercise NMS
        pred[v] = {"bounds": bs}

    ref_pre = ref.preprocess_moment_bounds(gt, json.loads(json.dumps(pred)))
    our_pre = ours.preprocess_moment_bounds(gt, json.loads(json.dumps(pred)))
    for v in gt:
        np.testing.assert_allclose(
            np.asarray(our_pre[v]["bounds"], dtype=float),
            np.asarray(ref_pre[v]["bounds"], dtype=float), atol=1e-9, err_msg=v)

    _set_ref_categories(ref, real_cats["prompt_to_cat"], real_cats["video_to_cat"])
    expected = ref.compute_step_bound_scores(gt, ref_pre)
    got = ours.compute_step_bound_scores(
        gt, our_pre, ours.Categories(real_cats["prompt_to_cat"],
                                     real_cats["video_to_cat"]))
    _assert_close(got, expected)
