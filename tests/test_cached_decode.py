"""KV-cached decoding parity: decode_step must reproduce the full
teacher-forced forward position by position, and the cached beam search
must return exactly what the full-re-decode beam returns."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hirest_tpu.config import DecoderConfig
from hirest_tpu.infer.beam import beam_search, beam_search_cached
from hirest_tpu.models.caption import CaptionDecoder

CFG = DecoderConfig(vocab_size=40, hidden_size=16, num_decoder_layers=2,
                    num_attention_heads=4, intermediate_size=32,
                    max_target_embeddings=32)
BOS, EOS = 2, 3


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    dec = CaptionDecoder(CFG)
    enc = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 40, size=(2, 7)).astype(np.int32))
    params = dec.init(jax.random.PRNGKey(0), ids, enc)
    return dec, params, enc, ids


def test_decode_step_matches_full(setup):
    dec, params, enc, ids = setup
    full = np.asarray(dec.apply(params, ids, enc,
                                jnp.ones_like(ids)))  # [B, L, V]

    cross_kv = dec.apply(params, enc, method=CaptionDecoder.cross_kv)
    cache = dec.apply(params, 2, ids.shape[1], method=CaptionDecoder.init_cache)
    for t in range(ids.shape[1]):
        logits, cache = dec.apply(params, ids[:, t], t, cross_kv, cache,
                                  method=CaptionDecoder.decode_step)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   rtol=2e-5, atol=2e-5)


def test_cached_beam_matches_full_beam(setup):
    dec, params, enc, _ = setup
    b, beam, max_words = 2, 3, 8
    enc_rpt = jnp.repeat(enc, beam, axis=0)

    def logits_fn(ids, t):
        full = dec.apply(params, ids[:, :max_words], enc_rpt)
        return full[:, t]

    want_ids, want_scores = jax.jit(
        lambda: beam_search(logits_fn, b, beam, max_words, BOS, EOS))()

    cross_kv = dec.apply(params, enc_rpt, method=CaptionDecoder.cross_kv)
    cache = dec.apply(params, b * beam, max_words + 1,
                      method=CaptionDecoder.init_cache)

    def step_fn(last, t, cache):
        return dec.apply(params, last, t, cross_kv, cache,
                         method=CaptionDecoder.decode_step)

    def gather_fn(cache, src):
        return jax.tree_util.tree_map(lambda x: x[src], cache)

    got_ids, got_scores = jax.jit(
        lambda: beam_search_cached(step_fn, gather_fn, cache, b, beam,
                                   max_words, BOS, EOS))()

    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores),
                               rtol=1e-4)
