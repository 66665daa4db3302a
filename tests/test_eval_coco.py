import math

import pytest

from hirest_tpu.eval import coco
from hirest_tpu.eval.captions import evaluate_step_captions


def test_tokenize_strips_punct_and_lowercases():
    assert coco.tokenize("Add the Salt, and water-mix!") == [
        "add", "the", "salt", "and", "water", "mix"]


def test_bleu_perfect_match():
    scores = coco.bleu(["add salt and water"], [["add salt and water"]])
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_against_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    cands = [
        "take grinned oats flour",
        "add carrot and chopped spinach into the bowl",
        "heat the pan and add fruit salt",
    ]
    refs = [
        ["take the oats flour"],
        ["add carrot and spinach"],
        ["heat pan and add fruit salt now"],
    ]
    ours = coco.bleu(cands, refs)
    tok_c = [coco.tokenize(c) for c in cands]
    tok_r = [[coco.tokenize(r) for r in rs] for rs in refs]
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n)
        want = corpus_bleu(tok_r, tok_c, weights=weights)
        assert ours[n - 1] == pytest.approx(want, abs=1e-4), f"BLEU-{n}"


def test_rouge_l_simple():
    # cand "a b c", ref "a c": LCS=2, P=2/3, R=1, beta=1.2
    p, r, beta = 2 / 3, 1.0, 1.2
    want = (1 + beta**2) * p * r / (r + beta**2 * p)
    got = coco.rouge_l(["a b c"], [["a c"]])
    assert got == pytest.approx(want, abs=1e-9)


def test_cider_identical_vs_disjoint():
    cands = ["add salt to the pan", "mix the flour well"]
    refs = [["add salt to the pan"], ["mix the flour well"]]
    perfect = coco.cider(cands, refs)
    disjoint = coco.cider(["totally unrelated words here"] * 2, refs)
    assert perfect > disjoint
    assert disjoint == pytest.approx(0.0, abs=1e-9)


def test_coco_evaluator_surface():
    # default meteor_version is "1.5" (the jar's model), same as the CLI —
    # the 2005 mode is exercised explicitly below
    ev = coco.CocoEvaluator(meteor_version="2005")
    res = ev.run_evaluation(["a b c d e"], ["a b c d e"])
    assert set(res) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
    assert res["Bleu_4"] == pytest.approx(1.0, abs=1e-4)
    # exact self-match, 5 tokens: 1 - gamma*(1/5)**beta = 1 - 0.5*0.008
    assert res["METEOR"] == pytest.approx(0.996, abs=1e-9)
    assert coco.CocoEvaluator().meteor_version == "1.5"  # CLI-consistent


def test_evaluate_step_captions_end_to_end():
    gt = {
        "v1.mp4": {"captions": [
            {"sentence": "Add salt", "start": 0, "end": 4},
            {"sentence": "Mix well", "start": 4, "end": 8},
        ]},
    }
    pred = {
        "v1.mp4": {"captions": [
            {"sentence": "add salt"},
            {"sentence": "mix well"},
        ]},
    }
    res = evaluate_step_captions(gt, pred)
    assert res["all"]["Total"] == 1
    assert res["all"]["Bleu_1"] == pytest.approx(100.0, abs=1e-4)
    assert res["all"]["CLIPScore"] == 0.0  # no clipscore plugin -> reference default
    assert "Entailment" not in res["all"]   # no entailment plugin provided


def test_evaluate_step_captions_pinned_in_both_meteor_modes():
    """End-to-end step-captioning scores pinned in BOTH METEOR modes so the
    CLI default switch to 1.5 (eval/cli.py) stays regression-locked; the
    modes are tuned differently and must NOT be interchangeable."""
    gt = {
        "v1.mp4": {"captions": [
            {"sentence": "Add the salt and water", "start": 0, "end": 4},
            {"sentence": "Mix the flour well in the bowl", "start": 4,
             "end": 8},
        ]},
        "v2.mp4": {"captions": [
            {"sentence": "Heat the pan on the stove", "start": 0, "end": 5},
        ]},
    }
    pred = {
        "v1.mp4": {"captions": [
            {"sentence": "add salt and some water"},
            {"sentence": "mix flour in a bowl"},
        ]},
        "v2.mp4": {"captions": [
            {"sentence": "heat a pan"},
        ]},
    }
    pinned = {"2005": 36.693541, "1.5": 29.264081}
    for version, want in pinned.items():
        res = evaluate_step_captions(
            gt, pred,
            coco_evaluator=coco.CocoEvaluator(meteor_version=version))
        assert res["all"]["METEOR"] == pytest.approx(want, abs=1e-4), version
        # non-METEOR metrics are version-independent
        assert res["all"]["Bleu_1"] == pytest.approx(52.362492, abs=1e-4)


def test_evaluate_step_captions_with_entailment_plugin():
    gt = {"v": {"captions": [{"sentence": "x", "start": 0, "end": 1}]}}
    pred = {"v": {"captions": [{"sentence": "x"}]}}
    res = evaluate_step_captions(gt, pred, entailment_fn=lambda p, h: 0)
    assert res["all"]["Entailment"] == 100.0
    assert res["all"]["Netural"] == 0.0  # reference key spelling preserved
