"""Pure-Python METEOR for step-caption scoring.

The reference's `language_evaluation.CocoEvaluator()` default metric set
includes METEOR (/root/reference/evaluate.py:299-301), scored by the Java
METEOR-1.5 jar in coco-caption. This module provides a dependency-free
METEOR so the framework's CocoEvaluator reports the full metric family:

- Alignment: exact-match stage, then Porter-stem stage on the residue,
  each matching every hypothesis word (scanned from the end) to the latest
  still-unused reference word — the published METEOR unigram-alignment
  order as standardized by NLTK's `meteor_score` (Banerjee & Lavie 2005).
- Score: fmean = P*R / (alpha*P + (1-alpha)*R), fragmentation penalty
  gamma * (chunks/matches)^beta, sentence score (1-penalty)*fmean, max over
  references, corpus score = mean over sentences (alpha=0.9, beta=3,
  gamma=0.5).

Documented deviations from the METEOR-1.5 jar (which cannot run here: it
needs a JVM plus ~60 MB synonym/paraphrase tables): no WordNet-synonym or
paraphrase stages, original-paper parameters rather than the 1.5 English
task tuning, and arithmetic-mean aggregation instead of pooled corpus
statistics. Golden parity with `nltk.translate.meteor_score` (WordNet stage
disabled) is asserted in tests/test_meteor.py.

The stemmer is an independent implementation of the canonical Porter (1980)
algorithm — no Martin/NLTK extension rules — so scores are reproducible
without nltk installed.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] decomposition of the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_consonant(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    return (len(word) >= 3
            and _is_consonant(word, len(word) - 3)
            and not _is_consonant(word, len(word) - 2)
            and _is_consonant(word, len(word) - 1)
            and word[-1] not in "wxy")


def _apply_rules(word: str, rules) -> str:
    """First rule whose suffix matches fires (or blocks, if its condition
    fails) — Porter's 'longest match in the step' convention is encoded by
    rule order."""
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_consonant(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
        elif word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def porter_stem(word: str) -> str:
    """Canonical Porter (1980) stemmer, lowercased input assumed."""
    w = word

    # Step 1a
    w = _apply_rules(w, [("sses", "ss", None), ("ies", "i", None),
                         ("ss", "ss", None), ("s", "", None)])

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        rule_fired = False
        if w.endswith("ed") and _contains_vowel(w[:-2]):
            w, rule_fired = w[:-2], True
        elif w.endswith("ing") and _contains_vowel(w[:-3]):
            w, rule_fired = w[:-3], True
        if rule_fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_consonant(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (original-paper rule list: abli -> able, no logi rule)
    m_pos = lambda stem: _measure(stem) > 0
    w = _apply_rules(w, [
        ("ational", "ate", m_pos), ("tional", "tion", m_pos),
        ("enci", "ence", m_pos), ("anci", "ance", m_pos),
        ("izer", "ize", m_pos), ("abli", "able", m_pos),
        ("alli", "al", m_pos), ("entli", "ent", m_pos),
        ("eli", "e", m_pos), ("ousli", "ous", m_pos),
        ("ization", "ize", m_pos), ("ation", "ate", m_pos),
        ("ator", "ate", m_pos), ("alism", "al", m_pos),
        ("iveness", "ive", m_pos), ("fulness", "ful", m_pos),
        ("ousness", "ous", m_pos), ("aliti", "al", m_pos),
        ("iviti", "ive", m_pos), ("biliti", "ble", m_pos),
    ])

    # Step 3
    w = _apply_rules(w, [
        ("icate", "ic", m_pos), ("ative", "", m_pos), ("alize", "al", m_pos),
        ("iciti", "ic", m_pos), ("ical", "ic", m_pos), ("ful", "", m_pos),
        ("ness", "", m_pos),
    ])

    # Step 4
    m_gt1 = lambda stem: _measure(stem) > 1
    w = _apply_rules(w, [
        ("al", "", m_gt1), ("ance", "", m_gt1), ("ence", "", m_gt1),
        ("er", "", m_gt1), ("ic", "", m_gt1), ("able", "", m_gt1),
        ("ible", "", m_gt1), ("ant", "", m_gt1), ("ement", "", m_gt1),
        ("ment", "", m_gt1), ("ent", "", m_gt1),
        ("ion", "", lambda stem: _measure(stem) > 1 and stem[-1:] in ("s", "t")),
        ("ou", "", m_gt1), ("ism", "", m_gt1), ("ate", "", m_gt1),
        ("iti", "", m_gt1), ("ous", "", m_gt1), ("ive", "", m_gt1),
        ("ize", "", m_gt1),
    ])

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w[:-1]) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Alignment + score
# ---------------------------------------------------------------------------


def _stage_match(hyp, ref, key):
    """Match each remaining hypothesis word (scanned from the END) to the
    latest unused reference word with equal key. hyp/ref are lists of
    (original_index, word); returns (matches, hyp_rest, ref_rest)."""
    positions: dict[str, list[int]] = {}
    for j, (_, rw) in enumerate(ref):
        positions.setdefault(key(rw), []).append(j)

    matches = []
    used_h, used_r = set(), set()
    for i in range(len(hyp) - 1, -1, -1):
        avail = positions.get(key(hyp[i][1]))
        if avail:
            j = avail.pop()
            used_h.add(i)
            used_r.add(j)
            matches.append((hyp[i][0], ref[j][0]))
    hyp_rest = [p for i, p in enumerate(hyp) if i not in used_h]
    ref_rest = [p for j, p in enumerate(ref) if j not in used_r]
    return matches, hyp_rest, ref_rest


def align(hyp_tokens: list[str], ref_tokens: list[str]):
    """Exact stage then Porter-stem stage; matches sorted by hypothesis
    index, as METEOR's unigram aligner produces them."""
    hyp = list(enumerate(hyp_tokens))
    ref = list(enumerate(ref_tokens))
    exact, hyp, ref = _stage_match(hyp, ref, lambda w: w)
    stemmed, hyp, ref = _stage_match(hyp, ref, porter_stem)
    return sorted(exact + stemmed, key=lambda pair: pair[0])


def _count_chunks(matches) -> int:
    chunks = 1
    for a, b in zip(matches, matches[1:]):
        if not (b[0] == a[0] + 1 and b[1] == a[1] + 1):
            chunks += 1
    return chunks


def meteor_single(hyp_tokens: list[str], ref_tokens: list[str],
                  alpha: float = 0.9, beta: float = 3.0,
                  gamma: float = 0.5) -> float:
    hyp = [t.lower() for t in hyp_tokens]
    ref = [t.lower() for t in ref_tokens]
    matches = align(hyp, ref)
    m = len(matches)
    if m == 0 or not hyp or not ref:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = (precision * recall) / (alpha * precision + (1 - alpha) * recall)
    penalty = gamma * (_count_chunks(matches) / m) ** beta
    return (1 - penalty) * fmean


def meteor(candidates: list[list[str]], references: list[list[list[str]]],
           alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    """Corpus METEOR: per-sentence max over references, arithmetic mean."""
    assert len(candidates) == len(references)
    if not candidates:
        return 0.0
    total = 0.0
    for cand, refs in zip(candidates, references):
        total += max(meteor_single(cand, r, alpha, beta, gamma) for r in refs)
    return total / len(candidates)
