"""Whisper decoding-rule parity tests (reference extract_ASR.py:42-104
semantics: timestamp rules, temperature fallback, quality gates, the 30 s
seek loop) plus the GPT-2 byte-level BPE tokenizer."""

import json

import numpy as np
import pytest

from hirest_tpu.extraction.whisper_decode import (
    DecodeOptions, DecodeResult, FRAMES_PER_SECOND, N_FRAMES, TIME_PRECISION,
    build_suppress_list, compression_ratio, decode_segment,
    decode_with_fallback, timestamp_rules, transcribe_with_rules)
from hirest_tpu.tokenizers.gpt2_bpe import (Gpt2BpeTokenizer, WhisperEnTokenizer,
                                            bytes_to_unicode)


# ---------------------------------------------------------------------------
# GPT-2 BPE
# ---------------------------------------------------------------------------


def _write_tiny_vocab(tmp_path):
    """Byte-complete vocab + a few merges, hand-checkable."""
    b2u = bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    # merges in priority order: "lo" wins over "low" building blocks
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("Ġ", "low")]
    for a, b in merges:
        tokens.append(a + b)
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return str(vp), str(mp), vocab


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_bpe_merge_order_and_roundtrip(tmp_path):
    vp, mp, vocab = _write_tiny_vocab(tmp_path)
    tok = Gpt2BpeTokenizer(vp, mp)
    # "lower" -> pre-token "lower": l+o -> lo; lo+w -> low; e+r -> er
    ids = tok.encode("lower")
    assert [tok.decoder[i] for i in ids] == ["low", "er"]
    # " low" -> "Ġlow" via the Ġ+low merge
    ids2 = tok.encode(" low")
    assert [tok.decoder[i] for i in ids2] == ["Ġlow"]
    assert tok.decode(tok.encode("lower lower")) == "lower lower"


def test_bpe_handles_unicode_bytes(tmp_path):
    vp, mp, _ = _write_tiny_vocab(tmp_path)
    tok = Gpt2BpeTokenizer(vp, mp)
    s = "héllo ♪"
    assert tok.decode(tok.encode(s)) == s


def test_pretokenize_underscore_and_numerics(tmp_path):
    """Canonical GPT-2 pre-tokenization: '_' is punctuation (\\p{L} excludes
    it), ' _' is one pre-token, and Unicode numerics (², ½) split as \\p{N}.
    Regression: the old `re` approximation dropped underscores entirely,
    which poisoned non_speech_tokens() with the bare-space token."""
    vp, mp, vocab = _write_tiny_vocab(tmp_path)
    tok = Gpt2BpeTokenizer(vp, mp)
    assert tok.pat.findall("a_b") == ["a", "_", "b"]
    assert tok.pat.findall("_") == ["_"]
    assert tok.pat.findall(" _") == [" _"]
    assert tok.pat.findall("x² ½") == ["x", "²", " ½"]
    assert tok.decode(tok.encode("a_b _ c")) == "a_b _ c"


def test_non_speech_tokens_underscore_not_space(tmp_path):
    # like _write_tiny_vocab but with the 'Ġ-' / "Ġ'" merges the real vocab
    # has, so encode(" -")[0] is not the bare space token
    b2u = bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    # Ġâ: real-vocab merge of space + first utf-8 byte of the ♪-family
    # symbols, so the miscellaneous branch's tokens[0] is not bare space
    merges = [("Ġ", "-"), ("Ġ", "'"), ("Ġ", "â")]
    tokens += [a + b for a, b in merges]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    wt = WhisperEnTokenizer(str(vp), str(mp))
    ns = wt.non_speech_tokens()
    # '_' itself is suppressed (single-token symbol) ...
    assert vocab["_"] in ns
    # ... but the bare space token must NOT be (the old-pattern bug: ' _'
    # pre-tokenized to [' '], adding the space token to the suppress list)
    assert vocab["Ġ"] not in ns


# ---------------------------------------------------------------------------
# Fake tokenizer with the real special-token layout
# ---------------------------------------------------------------------------


class FakeTok:
    EOT = WhisperEnTokenizer.EOT
    SOT = WhisperEnTokenizer.SOT
    TRANSLATE = WhisperEnTokenizer.TRANSLATE
    TRANSCRIBE = WhisperEnTokenizer.TRANSCRIBE
    SOT_LM = WhisperEnTokenizer.SOT_LM
    SOT_PREV = WhisperEnTokenizer.SOT_PREV
    NO_SPEECH = WhisperEnTokenizer.NO_SPEECH
    NO_TIMESTAMPS = WhisperEnTokenizer.NO_TIMESTAMPS
    TIMESTAMP_BEGIN = WhisperEnTokenizer.TIMESTAMP_BEGIN
    VOCAB = 51864

    def encode(self, text):
        return [min(ord(c), 255) for c in text]

    def decode(self, ids):
        return "".join(chr(int(i)) for i in ids if int(i) < 256)

    def non_speech_tokens(self):
        return [5, 7]


TS = FakeTok.TIMESTAMP_BEGIN


def _logits(n=1):
    return np.zeros((n, FakeTok.VOCAB))


def test_timestamp_rules_force_initial_timestamp():
    tok = FakeTok()
    logits = _logits()
    seqs = [[tok.SOT]]
    timestamp_rules(logits, seqs, tok, sample_begin=1, max_initial_timestamp=1.0)
    assert np.all(np.isneginf(logits[0, : TS]))            # no text
    max_idx = TS + round(1.0 / TIME_PRECISION)
    assert not np.isneginf(logits[0, TS])                   # <|0.00|> allowed
    assert not np.isneginf(logits[0, max_idx])              # <|1.00|> allowed
    assert np.all(np.isneginf(logits[0, max_idx + 1:]))     # beyond cap


def test_timestamp_rules_pairing():
    tok = FakeTok()
    # after text + one (closing-candidate) timestamp: text is banned
    logits = _logits()
    # give EOT real mass so the sum-of-timestamp-probability rule (which
    # suppresses everything below timestamp_begin, EOT included) stays quiet
    logits[0, tok.EOT] = 50.0
    timestamp_rules(logits, [[tok.SOT, TS, 65, TS + 100]], tok, 1, 1.0)
    assert np.all(np.isneginf(logits[0, : tok.EOT]))
    assert not np.isneginf(logits[0, tok.EOT])              # EOT stays legal
    assert not np.isneginf(logits[0, TS + 100])             # pair may repeat
    assert np.all(np.isneginf(logits[0, TS: TS + 100]))     # no decrease

    # after a complete pair: another timestamp is banned
    logits = _logits()
    timestamp_rules(logits, [[tok.SOT, TS, 65, TS + 100, TS + 100]], tok, 1, 1.0)
    assert np.all(np.isneginf(logits[0, TS:]))


def test_timestamp_rules_monotonic():
    tok = FakeTok()
    logits = _logits()
    # sequence: <|0.00|> text ... next timestamps must be > last pair's end
    timestamp_rules(logits, [[tok.SOT, TS + 50, 65, TS + 80, TS + 80, 66]],
                    tok, 1, 1.0)
    assert np.all(np.isneginf(logits[0, TS: TS + 81]))


def test_timestamp_sum_probability_rule():
    tok = FakeTok()
    logits = _logits()
    # spread mass over many timestamps so their SUM beats the best text token
    logits[0, TS: TS + 200] = 2.0
    logits[0, 65] = 2.5
    timestamp_rules(logits, [[tok.SOT, TS, 65]], tok, 1, 1.0)
    assert np.all(np.isneginf(logits[0, : TS]))


def test_build_suppress_list():
    tok = FakeTok()
    ids = build_suppress_list(tok, "-1")
    for t in (5, 7, tok.TRANSCRIBE, tok.TRANSLATE, tok.SOT, tok.SOT_PREV,
              tok.SOT_LM, tok.NO_SPEECH):
        assert t in ids
    explicit = build_suppress_list(tok, (3,))
    assert 3 in explicit and 5 not in explicit


# ---------------------------------------------------------------------------
# Scripted fake model
# ---------------------------------------------------------------------------


class ScriptAdapter:
    """Emits logits that (under greedy) walk a scripted token list per
    window; restarts the script at each SOT feed. no_speech_logit controls
    the probability mass at NO_SPEECH for the SOT-position logits."""

    def __init__(self, script, no_speech_logit=-10.0, text_logit=5.0):
        self.script = script
        self.no_speech_logit = no_speech_logit
        self.text_logit = text_logit
        self.i = 0
        self.reorders = []

    def encode(self, mel):
        return mel  # unused

    def init_state(self, enc, n_seq, max_len):
        return {"n": n_seq}

    def step(self, state, tokens, pos):
        n = state["n"]
        if int(tokens[0]) == FakeTok.SOT:
            self.i = 0
        logits = np.full((n, FakeTok.VOCAB), -20.0)
        if int(tokens[0]) == FakeTok.SOT:
            logits[:, FakeTok.NO_SPEECH] = self.no_speech_logit
        want = (self.script[self.i] if self.i < len(self.script)
                else FakeTok.EOT)
        self.i += 1
        logits[:, want] = self.text_logit
        return logits, state

    def reorder(self, state, src):
        self.reorders.append(list(src))
        return state


GREEDY = DecodeOptions(temperature=(0.0,), beam_size=None, best_of=1,
                       sample_len=24, compression_ratio_threshold=None,
                       logprob_threshold=None, no_speech_threshold=None)


def test_decode_segment_greedy_follows_script():
    tok = FakeTok()
    script = [TS, 72, 73, TS + 100, FakeTok.EOT]
    res = decode_segment(ScriptAdapter(script), None, tok, GREEDY, 0.0)
    assert res.tokens == script[:-1]
    assert res.no_speech_prob < 0.5


def test_decode_segment_beam_prefers_high_logprob():
    tok = FakeTok()

    class TwoWay(ScriptAdapter):
        """First sampled step offers two timestamps; the lower-scoring one
        leads to an immediate EOT bonus path — beam must keep both and pick
        by total logprob."""

        def step(self, state, tokens, pos):
            n = state["n"]
            logits = np.full((n, FakeTok.VOCAB), -20.0)
            if int(tokens[0]) == FakeTok.SOT:
                logits[:, TS] = 3.0
                logits[:, TS + 1] = 2.9
                return logits, state
            logits[:, FakeTok.EOT] = 5.0
            return logits, state

    opts = DecodeOptions(temperature=(0.0,), beam_size=2, sample_len=8,
                         compression_ratio_threshold=None,
                         logprob_threshold=None, no_speech_threshold=None)
    adapter = TwoWay([])
    res = decode_segment(adapter, None, tok, opts, 0.0)
    assert res.tokens == [TS]           # higher first-step logprob wins
    assert adapter.reorders              # beam cache reordering exercised


def test_beam_finalize_tops_up_live_beams():
    """BeamSearchDecoder.finalize parity: when fewer than beam_size beams
    finished naturally, the remaining live beams are appended (tokens+EOT,
    no extra logprob) so a strong never-EOT beam can outrank a weak early
    finisher under the length penalty."""
    tok = FakeTok()
    A, B, C = 80, 81, 82

    class Forked(ScriptAdapter):
        def step(self, state, tokens, pos):
            n = state["n"]
            logits = np.full((n, FakeTok.VOCAB), -20.0)
            for j in range(n):
                t = int(tokens[j])
                if t in (FakeTok.SOT, FakeTok.NO_TIMESTAMPS):
                    logits[j, A] = 5.0      # strong beam: never emits EOT
                    logits[j, B] = 4.0      # weak beam: EOTs immediately
                elif t == B:
                    logits[j, FakeTok.EOT] = 5.0
                else:
                    logits[j, C] = 5.0
            return logits, state

    opts = DecodeOptions(temperature=(0.0,), beam_size=2, sample_len=6,
                         without_timestamps=True,
                         compression_ratio_threshold=None,
                         logprob_threshold=None, no_speech_threshold=None)
    res = decode_segment(Forked([]), None, tok, opts, 0.0)
    # without the top-up only the early-EOT B beam exists in `finished`
    assert res.tokens[0] == A


def test_fallback_escalates_on_compression_then_accepts():
    tok = FakeTok()
    calls = []

    def fake_decode(adapter, enc, t, options, temperature, prompt_tokens=(),
                    rng=None):
        calls.append(temperature)
        if temperature < 0.5:
            return DecodeResult(tokens=tok.encode("ha" * 200),
                                avg_logprob=-0.2, no_speech_prob=0.0,
                                temperature=temperature)
        return DecodeResult(tokens=tok.encode("a normal sentence here"),
                            avg_logprob=-0.3, no_speech_prob=0.0,
                            temperature=temperature)

    opts = DecodeOptions()
    res = decode_with_fallback(None, None, tok, opts, decode_fn=fake_decode)
    assert res.temperature == 0.55
    assert calls == [0.15, 0.35, 0.55]
    assert res.compression_ratio <= 2.4


def test_fallback_escalates_on_low_logprob():
    tok = FakeTok()

    def fake_decode(adapter, enc, t, options, temperature, prompt_tokens=(),
                    rng=None):
        lp = -2.0 if temperature < 0.9 else -0.5
        return DecodeResult(tokens=tok.encode("some words"), avg_logprob=lp,
                            no_speech_prob=0.0, temperature=temperature)

    res = decode_with_fallback(None, None, tok, DecodeOptions(),
                               decode_fn=fake_decode)
    assert res.temperature == 0.95


def test_fallback_escalates_even_on_probable_silence():
    """The pinned whisper (eff383b) has NO silence short-circuit inside
    decode_with_fallback: a low-logprob high-no-speech window still walks the
    whole temperature schedule; the seek loop's should_skip gate decides
    whether to drop the segment afterwards."""
    tok = FakeTok()
    calls = []

    def fake_decode(adapter, enc, t, options, temperature, prompt_tokens=(),
                    rng=None):
        calls.append(temperature)
        return DecodeResult(tokens=[], avg_logprob=-5.0, no_speech_prob=0.9,
                            temperature=temperature)

    res = decode_with_fallback(None, None, tok, DecodeOptions(),
                               decode_fn=fake_decode)
    assert calls == list(DecodeOptions().temperature)   # full escalation
    assert res.temperature == DecodeOptions().temperature[-1]
    assert res.no_speech_prob == 0.9


# ---------------------------------------------------------------------------
# Seek loop
# ---------------------------------------------------------------------------


def _audio(seconds: float) -> np.ndarray:
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_seek_loop_splits_at_timestamp_pairs():
    tok = FakeTok()
    # window script: <|0.00|> hi <|2.00|><|2.00|> yo <|4.00|> EOT
    script = [TS, 104, 105, TS + 100, TS + 100, 121, 111, TS + 200,
              FakeTok.EOT]
    adapter = ScriptAdapter(script)
    out = transcribe_with_rules(adapter, _audio(25.0), tok, GREEDY)
    assert len(out["segments"]) == 2
    s0, s1 = out["segments"]
    assert (s0["start"], s0["end"]) == (0.0, 2.0)
    assert (s1["start"], s1["end"]) == (2.0, 4.0)
    assert s0["text"] == "hi"
    assert s1["text"] == "yo"


def test_seek_loop_advances_to_last_pair_and_offsets():
    tok = FakeTok()
    # no single-timestamp ending: ends right after a pair at <|20.00|>,
    # so the next window starts at 20 s and segment times are offset
    script = [TS, 104, TS + 1000, TS + 1000, 105, FakeTok.EOT]
    adapter = ScriptAdapter(script)
    out = transcribe_with_rules(adapter, _audio(50.0), tok, GREEDY)
    # window 1 consumed up to 20 s -> second window at offset 20 s
    starts = [s["start"] for s in out["segments"]]
    assert starts[0] == 0.0
    assert any(s >= 20.0 for s in starts)


def test_seek_loop_skips_no_speech_windows():
    tok = FakeTok()
    adapter = ScriptAdapter([TS, 104, TS + 100, FakeTok.EOT],
                            no_speech_logit=100.0, text_logit=-15.0)
    opts = DecodeOptions(temperature=(0.0,), beam_size=None, best_of=1,
                         sample_len=8, compression_ratio_threshold=None,
                         logprob_threshold=-1.0, no_speech_threshold=0.6)
    out = transcribe_with_rules(adapter, _audio(10.0), tok, opts)
    assert out["segments"] == []
    assert out["text"] == ""


# ---------------------------------------------------------------------------
# End-to-end on the flax model (tiny config, random weights)
# ---------------------------------------------------------------------------


def test_jax_adapter_end_to_end_tiny():
    from hirest_tpu.extraction.whisper_decode import JaxWhisperAdapter
    from hirest_tpu.models.whisper import (WhisperConfig, WhisperDecoder,
                                           WhisperEncoder)
    from hirest_tpu.utils.init import shape_only_init

    import jax.numpy as jnp

    cfg = WhisperConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                        heads=2, ffn_dim=64)
    enc_m = WhisperEncoder(cfg)
    dec_m = WhisperDecoder(cfg)
    mel = np.zeros((1, N_FRAMES, 80), np.float32)
    enc_p = shape_only_init(enc_m, jnp.asarray(mel))
    enc_out_shape = enc_m.apply(enc_p, jnp.asarray(mel))
    dec_p = shape_only_init(dec_m, jnp.zeros((1, 4), jnp.int32), enc_out_shape)

    adapter = JaxWhisperAdapter(enc_m, enc_p, dec_m, dec_p)
    tok = FakeTok()
    opts = DecodeOptions(temperature=(0.0, 0.5), beam_size=None, best_of=2,
                         sample_len=8, compression_ratio_threshold=None,
                         logprob_threshold=None, no_speech_threshold=None)
    out = transcribe_with_rules(adapter, _audio(2.0), tok, opts)
    assert "segments" in out and isinstance(out["segments"], list)
    # the real flax adapter must actually DECODE (quality gates are off
    # above, so the window cannot be silently skipped): a random-weight
    # model still emits at least one segment with well-formed fields
    assert len(out["segments"]) >= 1, out
    seg = out["segments"][0]
    assert seg["end"] >= seg["start"] >= 0.0
    assert isinstance(seg["text"], str) and isinstance(out["text"], str)


def test_compression_ratio():
    assert compression_ratio("ha" * 500) > 2.4
    assert compression_ratio("The quick brown fox jumps over the lazy dog") < 2.4


def test_seek_loop_prompt_excludes_unconsumed_tail():
    """When a window is only partially consumed (seek rewinds to the last
    timestamp pair), the tokens past that pair are re-decoded next window
    and must NOT leak into its previous-text prompt (whisper extends
    all_tokens only with the sliced segments' tokens)."""
    tok = FakeTok()
    tail = [117, 118, 119]
    # pair at <|20.00|> then an unconsumed tail, no single-ts ending
    script = [TS, 104, TS + 1000, TS + 1000] + tail + [FakeTok.EOT]

    class RecordingAdapter(ScriptAdapter):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.windows = []

        def step(self, state, tokens, pos):
            t = int(tokens[0])
            if t == FakeTok.SOT_PREV or (t == FakeTok.SOT and (
                    not self.windows or self.windows[-1])):
                self.windows.append([])
            if self.windows:
                self.windows[-1].append(t)
            return super().step(state, tokens, pos)

    adapter = RecordingAdapter(script)
    transcribe_with_rules(adapter, _audio(50.0), tok, GREEDY)
    assert len(adapter.windows) >= 2
    second_prompt = adapter.windows[1]
    for t in tail:
        assert t not in second_prompt, (t, second_prompt)
    assert 104 in second_prompt  # the consumed text DOES condition it
