"""Beam-search parity: jitted lax.scan beam vs a host-side oracle
re-implementing the OpenNMT-style semantics used by the reference
(advance/backtrack per instance, stop when top beam emits EOS)."""

import numpy as np
import jax
import jax.numpy as jnp

from hirest_tpu.infer.beam import beam_search

BOS, EOS, VOCAB = 1, 2, 12


class OracleBeam:
    """Single-instance beam with the reference's exact update rules."""

    def __init__(self, size):
        self.size = size
        self.done = False
        self.scores = np.zeros(size, dtype=np.float64)
        self.prev_ks = []
        self.next_ys = [np.full(size, BOS, dtype=int)]

    def advance(self, word_prob):  # word_prob [beam, V] log probs
        num_words = word_prob.shape[1]
        if len(self.prev_ks) > 0:
            beam_lk = word_prob + self.scores[:, None]
            flat = beam_lk.reshape(-1)
        else:
            flat = word_prob[0]
        order = np.argsort(-flat, kind="stable")[: self.size]
        best_scores = flat[order]
        self.scores = best_scores
        prev_k = order // num_words if len(self.prev_ks) > 0 else np.zeros(self.size, dtype=int)
        tok = order % num_words if len(self.prev_ks) > 0 else order
        self.prev_ks.append(prev_k)
        self.next_ys.append(tok)
        if self.next_ys[-1][0] == EOS:
            self.done = True
        return self.done

    def hypothesis(self, k=0):
        hyp = []
        for j in range(len(self.prev_ks) - 1, -1, -1):
            hyp.append(self.next_ys[j + 1][k])
            k = self.prev_ks[j][k]
        return [int(x) for x in hyp[::-1]]

    def state(self):
        """Current hypotheses (incl BOS), slot order."""
        return np.array([[BOS] + self.hypothesis(k) for k in range(self.size)])


def fixed_logits_table(rng, max_words):
    """Deterministic per-(step, token-prefix-sum) logits so both
    implementations see identical distributions."""
    return rng.normal(size=(max_words, VOCAB)).astype(np.float32) * 2.0


def run_oracle(table, batch, beam, max_words, eos_boost_step=None):
    outs = []
    for b in range(batch):
        bm = OracleBeam(beam)
        for t in range(max_words):
            state = bm.state()  # [beam, t+1]
            # logits depend on step, instance, and last token -> exercises backtracking
            logits = np.stack([table[t] + 0.3 * b + 0.1 * state[k, -1]
                               for k in range(beam)])
            if eos_boost_step is not None and t >= eos_boost_step:
                logits[:, EOS] += 50.0
            logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            if bm.advance(logp):
                break
        outs.append((bm.hypothesis(0), bm.scores[0]))
    return outs


def run_ours(table, batch, beam, max_words, eos_boost_step=None):
    table_j = jnp.asarray(table)

    def logits_fn(ids, t):  # ids [B*beam, L+1]
        last = ids[jnp.arange(ids.shape[0]), t]
        inst = jnp.arange(ids.shape[0]) // beam
        logits = table_j[t][None] + 0.3 * inst[:, None] + 0.1 * last[:, None]
        if eos_boost_step is not None:
            logits = jnp.where(t >= eos_boost_step,
                               logits.at[:, EOS].add(50.0), logits)
        return logits

    ids, scores = jax.jit(
        lambda: beam_search(logits_fn, batch, beam, max_words, BOS, EOS))()
    return np.asarray(ids), np.asarray(scores)


def test_beam_matches_oracle_no_eos():
    rng = np.random.default_rng(0)
    table = fixed_logits_table(rng, 6)
    table[:, EOS] = -10.0  # never finish
    want = run_oracle(table, batch=3, beam=4, max_words=6)
    ids, scores = run_ours(table, batch=3, beam=4, max_words=6)
    for b in range(3):
        assert ids[b].tolist() == want[b][0], f"instance {b}"
        np.testing.assert_allclose(scores[b], want[b][1], rtol=1e-4)


def test_beam_matches_oracle_with_early_eos():
    rng = np.random.default_rng(1)
    table = fixed_logits_table(rng, 8)
    want = run_oracle(table, batch=2, beam=3, max_words=8, eos_boost_step=3)
    ids, scores = run_ours(table, batch=2, beam=3, max_words=8, eos_boost_step=3)
    for b in range(2):
        hyp = want[b][0]
        got = ids[b].tolist()[: len(hyp)]
        assert got == hyp, f"instance {b}: {got} != {hyp}"
        # after EOS the sequence is frozen (PAD tail)
        assert all(x == 0 for x in ids[b].tolist()[len(hyp):])
        np.testing.assert_allclose(scores[b], want[b][1], rtol=1e-4)


def test_beam_first_step_uses_only_top_slot():
    # At step 1 all beams would produce identical logits; the reference only
    # expands slot 0, so the first-step candidates must be k distinct tokens
    # (not k copies of the argmax).
    table = np.zeros((1, VOCAB), dtype=np.float32)
    table[0, 5], table[0, 6], table[0, 7] = 3.0, 2.0, 1.0
    table[:, EOS] = -10
    ids, _ = run_ours(table, batch=1, beam=3, max_words=1)
    assert ids[0, 0] == 5


def test_beam_eos_runner_up_matches_oracle():
    """EOS as the step-0 RUNNER-UP: the finished 1-token hypothesis
    competes against live continuations — the trickiest finished-vs-live
    ranking case. Pin exact oracle parity (the reference semantics keep
    the live 5-path here, score and all)."""
    table = np.zeros((2, VOCAB), dtype=np.float32)
    table[0, 5] = 3.0
    table[0, EOS] = 2.5
    want = run_oracle(table, batch=1, beam=3, max_words=2)
    ids, scores = run_ours(table, batch=1, beam=3, max_words=2)
    assert ids[0].tolist() == want[0][0], (ids, want)
    np.testing.assert_allclose(scores[0], want[0][1], rtol=1e-4)
