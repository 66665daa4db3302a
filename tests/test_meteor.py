"""Golden tests for the pure-Python METEOR (hirest_tpu.eval.meteor).

Oracle: nltk.translate.meteor_score with the WordNet stage disabled (a stub
returning no synsets) and the Porter stemmer in ORIGINAL_ALGORITHM mode —
exactly the algorithm our dependency-free implementation follows. nltk is
present in this image but is not a runtime dependency of the framework.
"""

import numpy as np
import pytest

from hirest_tpu.eval import coco
from hirest_tpu.eval.meteor import align, meteor, meteor_single, porter_stem

nltk = pytest.importorskip("nltk")
from nltk.stem.porter import PorterStemmer  # noqa: E402
from nltk.translate.meteor_score import single_meteor_score  # noqa: E402


class _NoWordnet:
    def synsets(self, word):
        return []


ORACLE_STEMMER = PorterStemmer(PorterStemmer.ORIGINAL_ALGORITHM)


def oracle_meteor(hyp_tokens, ref_tokens):
    return single_meteor_score(
        ref_tokens, hyp_tokens, stemmer=ORACLE_STEMMER, wordnet=_NoWordnet())


WORDS = """
caption captions captioning captioned relational relate relational conditional
rational agreed feed plastered bled motoring sing conflated troubled sized
hopping tanned falling hissing fizzed failing filing happy sky enjoy
relational conditional rational valenci hesitanci digitizer conformabli
radicalli differentli vileli analogousli vietnamization predication operator
feudalism decisiveness hopefulness callousness formaliti sensitiviti sensibiliti
triplicate formative formalize electriciti electrical hopeful goodness revival
allowance inference airliner gyroscopic adjustable defensible irritant
replacement adjustment dependent adoption homologou communism activate angulariti
homologous effective bowdlerize probate rate cease controll roll mixing whisk
slice sliced slicing carefully quickly stir the a an and of to in for on with
oven heat heated heating cook cooked cooking bake baked baking add added adding
water flour sugar butter eggs milk bowl pan knife cut cutting pieces minutes
seconds hours degrees temperature remove removed serve served serving plate
"""


def test_porter_stem_matches_nltk_original_mode():
    mismatches = [(w, porter_stem(w), ORACLE_STEMMER.stem(w))
                  for w in WORDS.split()
                  if porter_stem(w) != ORACLE_STEMMER.stem(w)]
    assert not mismatches, mismatches[:10]


def test_porter_stem_random_letter_strings():
    rng = np.random.default_rng(0)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for _ in range(500):
        w = "".join(rng.choice(letters, size=rng.integers(1, 12)))
        assert porter_stem(w) == ORACLE_STEMMER.stem(w), w


CASES = [
    ("the cat sat on the mat", "the cat was sat on the mat"),
    ("preheat the oven to 350 degrees", "heat oven to 350 degrees fahrenheit"),
    ("mix the flour and sugar", "the flour and the sugar are mixed together"),
    ("no overlap whatsoever here", "completely different tokens appear"),
    ("identical sentence", "identical sentence"),
    ("a a a a", "a a"),
    ("running quickly", "run quick"),
    ("slice the onions thinly", "thinly slice the onion"),
    ("", "nonempty reference"),
    ("nonempty hypothesis", ""),
]


@pytest.mark.parametrize("hyp,ref", CASES)
def test_meteor_single_matches_nltk(hyp, ref):
    h, r = hyp.split(), ref.split()
    if not h or not r:
        # nltk raises ZeroDivisionError-guarded 0.0 as well, but only for
        # zero matches; empty sequences short-circuit in ours
        assert meteor_single(h, r) == 0.0
        return
    assert meteor_single(h, r) == pytest.approx(oracle_meteor(h, r), abs=1e-12)


def test_meteor_random_corpora_match_nltk():
    rng = np.random.default_rng(1)
    vocab = ("cut mix stir bake add the a and slice heat cool pour whisk "
             "fold bowl pan cake bread dough sauce oil salt water").split()
    for _ in range(200):
        h = list(rng.choice(vocab, size=rng.integers(1, 15)))
        r = list(rng.choice(vocab, size=rng.integers(1, 15)))
        assert meteor_single(h, r) == pytest.approx(
            oracle_meteor(h, r), abs=1e-12), (h, r)


def test_corpus_meteor_max_over_refs_and_mean():
    cands = [["the", "cat"], ["a", "dog", "runs"]]
    refs = [[["the", "cat"], ["a", "feline"]], [["dogs", "run"]]]
    expected = np.mean([
        max(oracle_meteor(cands[0], refs[0][0]), oracle_meteor(cands[0], refs[0][1])),
        oracle_meteor(cands[1], refs[1][0]),
    ])
    assert meteor(cands, refs) == pytest.approx(expected, abs=1e-12)


def test_alignment_indices_sorted_by_hypothesis():
    matches = align("b a c".split(), "a b c d".split())
    assert matches == sorted(matches, key=lambda p: p[0])
    assert len(matches) == 3


# ---------------------------------------------------------------------------
# METEOR 1.5 mode
# ---------------------------------------------------------------------------

from hirest_tpu.eval.meteor import (FUNCTION_WORDS, meteor_15,  # noqa: E402
                                    meteor_single_15)


@pytest.mark.parametrize("hyp,ref", [
    ("the cat sat on the mat", "the cat was sat on the mat"),
    ("preheat the oven to 350 degrees", "heat oven to 350 degrees fahrenheit"),
    ("running quickly", "run quick"),
    ("slice the onions thinly", "thinly slice the onion"),
    ("identical sentence", "identical sentence"),
])
def test_meteor15_reduces_to_nltk_with_matched_params(hyp, ref):
    """With delta=0.5 (function/content weights equal) and unit module
    weights, the 1.5 sentence formula reduces exactly to the 2005 formula
    with the 1.5 alpha/beta/gamma — cross-checked against nltk."""
    h, r = hyp.split(), ref.split()
    ours = meteor_single_15(h, r, delta=0.5, weights=(1.0, 1.0))
    oracle = single_meteor_score(r, h, stemmer=ORACLE_STEMMER,
                                 wordnet=_NoWordnet(),
                                 alpha=0.85, beta=0.2, gamma=0.6)
    assert ours == pytest.approx(oracle, abs=1e-12)


def test_meteor15_pinned_scores():
    """Regression pins for the full English parameterization (alpha=.85,
    beta=.2, gamma=.6, delta=.75, weights exact 1.0 / stem 0.6)."""
    assert meteor_single_15(
        "the cat sat on a mat".split(),
        "the cat sat on the mat".split()) == pytest.approx(
            0.42008241837057786, abs=1e-12)
    assert meteor_single_15(
        "slice the onions thinly".split(),
        "thinly slice the onion".split()) == pytest.approx(
            0.42034930257964653, abs=1e-12)
    c = [["mix", "the", "flour"], ["bake", "for", "ten", "minutes"]]
    r = [[["mix", "the", "flour", "and", "sugar"]],
         [["bake", "ten", "minutes"], ["cook", "for", "ten", "minutes"]]]
    assert meteor_15(c, r) == pytest.approx(0.39093169270369355, abs=1e-12)


def test_meteor15_function_word_discounting():
    """Meteor Universal weights CONTENT words by delta (=.75) and function
    words by 1-delta (=.25): matching only the content word recovers more
    weighted mass than matching only the function word, i.e. function-word
    matches are discounted."""
    assert "the" in FUNCTION_WORDS and "cat" not in FUNCTION_WORDS
    hit_func = meteor_single_15(["the", "dog"], ["the", "cat"])
    hit_cont = meteor_single_15(["a", "cat"], ["the", "cat"])
    assert hit_func != hit_cont  # the two regimes are actually distinguished
    assert hit_cont > hit_func


def test_meteor15_pooled_aggregation_not_mean():
    c = [["mix", "the", "flour"], ["bake", "for", "ten", "minutes"]]
    r = [[["mix", "the", "flour", "and", "sugar"]],
         [["bake", "ten", "minutes"], ["cook", "for", "ten", "minutes"]]]
    pooled = meteor_15(c, r)
    mean = np.mean([meteor_single_15(c[0], r[0][0]),
                    max(meteor_single_15(c[1], rr) for rr in r[1])])
    assert pooled != pytest.approx(mean, abs=1e-6)


def test_meteor15_via_coco_evaluator_flag():
    ev = coco.CocoEvaluator(coco_types=("METEOR",), meteor_version="1.5")
    res = ev.run_evaluation(["the cat sat"], ["the cat sat"])
    assert res["METEOR"] == pytest.approx(
        meteor_15([["the", "cat", "sat"]], [[["the", "cat", "sat"]]]))


def test_coco_evaluator_reports_meteor():
    ev = coco.CocoEvaluator(meteor_version="2005")
    res = ev.run_evaluation(["the cat sat"], ["the cat sat"])
    assert res["METEOR"] == pytest.approx(oracle_meteor(
        "the cat sat".split(), "the cat sat".split()), abs=1e-12)
    assert "SPICE" not in res  # absent without a hook, never silently zero

    ev2 = coco.CocoEvaluator(coco_types=("SPICE",), spice_fn=lambda c, r: 0.25)
    assert ev2.run_evaluation(["x"], ["x"]) == {"SPICE": 0.25}


def test_meteor_rejects_untokenized_strings():
    """A plain string where a token list is expected used to score a silent
    0.0 (each sentence counted as one 'token'); both corpus entry points
    must raise TypeError instead (VERDICT r3 weak #5)."""
    from hirest_tpu.eval.meteor import meteor, meteor_15

    good_c, good_r = [["add", "salt"]], [[["add", "salt"]]]
    assert meteor(good_c, good_r) > 0.0
    with pytest.raises(TypeError):
        meteor(["add salt"], good_r)          # str candidate
    with pytest.raises(TypeError):
        meteor(good_c, ["add salt"])          # str reference group
    with pytest.raises(TypeError):
        meteor(good_c, [["add salt"]])        # str reference
    with pytest.raises(TypeError):
        meteor_15(["add salt"], good_r)
    with pytest.raises(TypeError):
        meteor(["add salt"], good_r, version="1.5")  # guard through dispatch


def test_meteor_version_kwargs_not_silently_dropped():
    """1.5-only options under version='2005' must raise, and explicit
    alpha/beta/gamma must reach the selected version's scorer instead of
    binding to the wrapper's other-version defaults."""
    from hirest_tpu.eval.meteor import METEOR15_EN, meteor, meteor_15

    c, r = [["add", "the", "salt"]], [[["add", "salt"]]]
    with pytest.raises(TypeError, match="1.5"):
        meteor(c, r, synonyms=lambda w: set())        # 2005 + 1.5-only kw
    default15 = meteor(c, r, version="1.5")
    assert default15 == pytest.approx(meteor_15(c, r), abs=1e-12)
    moved = meteor(c, r, version="1.5", alpha=0.1)
    assert moved == pytest.approx(meteor_15(c, r, alpha=0.1), abs=1e-12)
    assert moved != pytest.approx(default15, abs=1e-9)
    assert METEOR15_EN["alpha"] != 0.1  # the override actually overrides


def test_meteor15_synonym_stage_injectable():
    """Module-2 synonym matching via an injected synset lookup (the jar
    uses WordNet, not shipped in this image): synonym pairs match at
    weight 0.8 after exact+stem stages."""
    from hirest_tpu.eval.meteor import align_modules_full, meteor_15

    syn = {"car": {1}, "automobile": {1}, "quick": {2}, "fast": {2}}
    lk = lambda w: syn.get(w, set())
    cand = [["the", "automobile", "is", "quick"]]
    refs = [[["the", "car", "is", "fast"]]]
    base = meteor_15(cand, refs)
    with_syn = meteor_15(cand, refs, synonyms=lk)
    assert with_syn > base
    assert with_syn == pytest.approx(0.4634922755398485, abs=1e-12)
    m = align_modules_full(cand[0], refs[0][0], synonyms=lk)
    assert [(hs, rs, mod) for hs, rs, mod in m] == [
        ((0,), (0,), 0), ((1,), (1,), 2), ((2,), (2,), 0), ((3,), (3,), 2)]


def test_meteor15_paraphrase_stage_injectable():
    """Module-3 paraphrase matching via an injected phrase-pair table (the
    jar's paraphrase-en.gz is not redistributable): unequal-length spans
    match as one block; fragmentation m is the mean of covered words."""
    from hirest_tpu.eval.meteor import (_stats_15, align_modules_full,
                                        meteor_15)

    tab = {(("right", "away"), ("immediately",))}
    cand = [["do", "it", "right", "away"]]
    refs = [[["do", "it", "immediately"]]]
    base = meteor_15(cand, refs)
    with_para = meteor_15(cand, refs, paraphrases=tab)
    assert with_para > base
    assert with_para == pytest.approx(0.3999211891916309, abs=1e-12)
    m = align_modules_full(cand[0], refs[0][0], paraphrases=tab)
    assert m == [((0,), (0,), 0), ((1,), (1,), 0), ((2, 3), (2,), 3)]
    s = _stats_15(cand[0], refs[0][0], 0.75, (1.0, 0.6, 0.8, 0.6),
                  None, tab)
    assert s["matches"] == pytest.approx(3.5)  # (4 hyp + 3 ref words) / 2
    assert s["chunks"] == 1  # contiguous on both sides
    # a callable table works too (e.g. a trie-backed lookup)
    fn = lambda a, b: (a, b) in tab
    assert meteor_15(cand, refs, paraphrases=fn) == pytest.approx(with_para)


def test_meteor15_plugin_stages_off_by_default():
    """Without injected data sources the 1.5 score is exact+stem only —
    the pinned-corpus scores must not move."""
    from hirest_tpu.eval.meteor import align_modules_full

    m = align_modules_full(["the", "automobile"], ["the", "car"])
    assert m == [((0,), (0,), 0)]
