"""Batched fixed-width beam search as a single jitted lax.scan program.

Replaces the reference's per-instance Python `Beam` objects and dynamic
active-set repacking (clip4caption/modules/beam.py:31-123 and
clip4caption/train.py:511-599) with a static-shape [B, beam] program:

- step 1 seeds scores as [0, -inf, ...] so the generic
  `scores[:, None] + log_probs` update reproduces the reference's
  first-step special case (beam.py:75-78);
- a `done` flag freezes an instance the first time the TOP beam emits EOS
  (beam.py:88-90) — exactly when the reference drops it from the active set;
- hypotheses are maintained in score-sorted slot order (the reference's
  topk keeps slots sorted, so its "sort then take hypothesis 0" final
  collection is our slot 0).

The decoder is re-run over the full fixed-length prefix each step (as the
reference does); with causal masking the logits at position t-1 are
independent of the PAD tail, so one compiled decoder shape serves all steps.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -1e18


def beam_search(
    logits_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    batch_size: int,
    beam_size: int,
    max_words: int,
    bos_id: int,
    eos_id: int,
):
    """Run beam search.

    Args:
      logits_fn: (ids [B*beam, L+1], t) -> next-token logits [B*beam, V]
        for position t (i.e. logits of token t+1 given ids[:, :t+1]).
        Called with t = 0 .. max_words-1. Must be jit-traceable.
      batch_size, beam_size, max_words: static sizes.
      bos_id, eos_id: special token ids.

    Returns:
      (best_ids [B, max_words], best_scores [B]): best hypothesis per
      instance excluding BOS (PAD-filled after EOS position).
    """
    b, k, length = batch_size, beam_size, max_words

    seqs0 = jnp.full((b, k, length + 1), 0, dtype=jnp.int32)
    seqs0 = seqs0.at[:, :, 0].set(bos_id)
    scores0 = jnp.full((b, k), NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    done0 = jnp.zeros((b,), dtype=bool)

    def step(carry, t):
        seqs, scores, done = carry
        flat_ids = seqs.reshape(b * k, length + 1)
        logits = logits_fn(flat_ids, t)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = log_probs.shape[-1]
        log_probs = log_probs.reshape(b, k, vocab)

        beam_lk = scores[:, :, None] + log_probs          # [B, k, V]
        flat = beam_lk.reshape(b, k * vocab)
        best_scores, best_ids = jax.lax.top_k(flat, k)     # sorted descending
        prev_k = best_ids // vocab                         # [B, k]
        next_tok = best_ids - prev_k * vocab

        new_seqs = jnp.take_along_axis(seqs, prev_k[:, :, None], axis=1)
        new_seqs = new_seqs.at[:, :, t + 1].set(next_tok)

        # freeze finished instances
        keep = done[:, None]
        seqs = jnp.where(keep[:, :, None], seqs, new_seqs)
        scores = jnp.where(keep, scores, best_scores)
        done = done | (seqs[:, 0, t + 1] == eos_id)
        return (seqs, scores, done), None

    (seqs, scores, done), _ = jax.lax.scan(step, (seqs0, scores0, done0),
                                           jnp.arange(length))
    return seqs[:, 0, 1:], scores[:, 0]


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def beam_search_jit(logits_fn, encoder_out, batch_size, beam_size, max_words,
                    bos_id, eos_id):
    """Convenience jitted wrapper binding `encoder_out` into logits_fn."""
    return beam_search(lambda ids, t: logits_fn(ids, t, encoder_out),
                       batch_size, beam_size, max_words, bos_id, eos_id)


def beam_search_cached(
    step_fn,
    gather_state_fn,
    init_state,
    batch_size: int,
    beam_size: int,
    max_words: int,
    bos_id: int,
    eos_id: int,
):
    """KV-cached beam search: same selection semantics as `beam_search` but
    the decoder sees only the newest token per step.

    Args:
      step_fn: (last_tokens [B*beam], t, state) -> (logits [B*beam, V], state).
        t is the position of last_tokens (0 = BOS).
      gather_state_fn: (state, src_rows [B*beam]) -> state reordered along the
        flat beam axis — applied after each top-k so the caches follow their
        hypotheses.
      init_state: decoder state (e.g. (cross_kv, kv_cache)).

    Returns (best_ids [B, max_words], best_scores [B]).
    """
    b, k, length = batch_size, beam_size, max_words

    seqs0 = jnp.zeros((b, k, length + 1), dtype=jnp.int32).at[:, :, 0].set(bos_id)
    scores0 = jnp.full((b, k), NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    done0 = jnp.zeros((b,), dtype=bool)

    def step(carry, t):
        seqs, scores, done, state = carry
        last = seqs.reshape(b * k, length + 1)[:, t]
        logits, state = step_fn(last, t, state)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = log_probs.shape[-1]
        log_probs = log_probs.reshape(b, k, vocab)

        beam_lk = scores[:, :, None] + log_probs
        best_scores, best_ids = jax.lax.top_k(beam_lk.reshape(b, k * vocab), k)
        prev_k = best_ids // vocab
        next_tok = best_ids - prev_k * vocab

        new_seqs = jnp.take_along_axis(seqs, prev_k[:, :, None], axis=1)
        new_seqs = new_seqs.at[:, :, t + 1].set(next_tok)

        keep = done[:, None]
        # done instances keep their slots in place (src = identity) so the
        # frozen caches stay aligned with the frozen sequences
        identity = jnp.broadcast_to(jnp.arange(k)[None], (b, k))
        src = jnp.where(keep, identity, prev_k)
        flat_src = (src + jnp.arange(b)[:, None] * k).reshape(b * k)
        state = gather_state_fn(state, flat_src)

        seqs = jnp.where(keep[:, :, None], seqs, new_seqs)
        scores = jnp.where(keep, scores, best_scores)
        done = done | (seqs[:, 0, t + 1] == eos_id)
        return (seqs, scores, done, state), None

    (seqs, scores, done, _), _ = jax.lax.scan(
        step, (seqs0, scores0, done0, init_state), jnp.arange(length))
    return seqs[:, 0, 1:], scores[:, 0]
