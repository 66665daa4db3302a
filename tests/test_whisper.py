"""Whisper-in-flax parity vs transformers.WhisperModel (random weights) and
the mel frontend vs transformers.WhisperFeatureExtractor."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hirest_tpu.models.whisper import (  # noqa: E402
    WhisperConfig,
    WhisperDecoder,
    WhisperEncoder,
    convert_whisper_decoder,
    convert_whisper_encoder,
    greedy_decode,
)

TOL = dict(rtol=3e-4, atol=3e-4)

CFG = WhisperConfig(num_mel_bins=80, d_model=64, encoder_layers=2,
                    decoder_layers=2, heads=4, ffn_dim=128,
                    max_source_positions=100, max_target_positions=50,
                    vocab_size=200)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import WhisperConfig as HFConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(d_model=CFG.d_model, encoder_layers=CFG.encoder_layers,
                      decoder_layers=CFG.decoder_layers,
                      encoder_attention_heads=CFG.heads,
                      decoder_attention_heads=CFG.heads,
                      encoder_ffn_dim=CFG.ffn_dim, decoder_ffn_dim=CFG.ffn_dim,
                      num_mel_bins=CFG.num_mel_bins,
                      max_source_positions=CFG.max_source_positions,
                      max_target_positions=CFG.max_target_positions,
                      vocab_size=CFG.vocab_size,
                      pad_token_id=0, bos_token_id=1, eos_token_id=3,
                      decoder_start_token_id=5)
    return WhisperModel(hf_cfg).eval()


def sd_of(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_encoder_parity(hf_model):
    mel = np.random.default_rng(0).normal(
        size=(2, CFG.num_mel_bins, CFG.max_source_positions * 2)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.encoder(torch.tensor(mel)).last_hidden_state.numpy()

    params = {"params": convert_whisper_encoder(sd_of(hf_model), CFG)}
    # flax takes time-major [B, T, mel]
    got = np.asarray(WhisperEncoder(CFG).apply(params,
                                               jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, **TOL)


def test_decoder_parity(hf_model):
    rng = np.random.default_rng(1)
    enc = rng.normal(size=(2, 10, CFG.d_model)).astype(np.float32)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 7))
    with torch.no_grad():
        hidden = hf_model.decoder(
            input_ids=torch.tensor(ids, dtype=torch.long),
            encoder_hidden_states=torch.tensor(enc)).last_hidden_state
        # HF ties the LM head to embed_tokens, same as ours
        want = (hidden @ hf_model.decoder.embed_tokens.weight.T).numpy()

    params = {"params": convert_whisper_decoder(sd_of(hf_model), CFG)}
    got = np.asarray(WhisperDecoder(CFG).apply(params, jnp.asarray(ids, jnp.int32),
                                               jnp.asarray(enc)))
    np.testing.assert_allclose(got, want, **TOL)


def test_greedy_decode_matches_uncached_rollout(hf_model):
    """The jitted KV-cached greedy decode must emit the same tokens as a
    host-side greedy rollout through the full (uncached) decoder — the
    decoder numerics themselves are tied to HF by test_decoder_parity."""
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(2, CFG.num_mel_bins, CFG.max_source_positions * 2)
                     ).astype(np.float32)
    prompt = np.array([[5, 9], [5, 2]], dtype=np.int32)
    eot = 3
    max_new = 8

    enc_params = {"params": convert_whisper_encoder(sd_of(hf_model), CFG)}
    dec_params = {"params": convert_whisper_decoder(sd_of(hf_model), CFG)}
    dec = WhisperDecoder(CFG)
    enc_out = WhisperEncoder(CFG).apply(enc_params,
                                        jnp.asarray(mel.transpose(0, 2, 1)))

    # host rollout: full-prefix decode each step. The buffer is kept at a
    # FIXED width (positions past the frontier hold eot filler) so the 8
    # steps share one jit trace — the causal mask makes position t's logits
    # independent of anything after t.
    plen = prompt.shape[1]
    ids = np.full((2, plen + max_new), eot, dtype=np.int32)
    ids[:, :plen] = prompt
    done = np.zeros(2, bool)
    apply = jax.jit(lambda ids: dec.apply(dec_params, ids, enc_out))
    for t in range(max_new):
        logits = np.asarray(apply(jnp.asarray(ids)))
        nxt = logits[:, plen + t - 1].argmax(-1).astype(np.int32)
        nxt = np.where(done, eot, nxt)
        done |= nxt == eot
        ids[:, plen + t] = nxt
    ids = ids[:, : plen + max_new]

    got = greedy_decode(dec, dec_params, enc_out, prompt,
                        max_new_tokens=max_new, eot_id=eot)
    assert got.tolist() == ids.tolist(), (got, ids)


def test_mel_frontend_matches_hf():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=SAMPLES) * 0.1).astype(np.float32)
    want = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]

    from hirest_tpu.extraction.mel import log_mel_spectrogram

    got = log_mel_spectrogram(audio).T  # HF returns [mel, frames]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


SAMPLES = 16000 * 3  # 3 s clip


def test_tokens_to_segments_and_srt():
    from hirest_tpu.extraction.asr import (EOT, TIMESTAMP_BEGIN,
                                           tokens_to_segments)
    from hirest_tpu.extraction.asr import segments_to_srt

    # <|0.00|> hello <|1.50|> <|1.50|> world <|3.00|> <eot>
    toks = [TIMESTAMP_BEGIN, 10, TIMESTAMP_BEGIN + 75,
            TIMESTAMP_BEGIN + 75, 20, TIMESTAMP_BEGIN + 150, EOT]
    segs = tokens_to_segments(toks, lambda ids: " ".join(f"w{i}" for i in ids),
                              chunk_offset=30.0)
    assert segs == [{"start": 30.0, "end": 31.5, "text": "w10"},
                    {"start": 31.5, "end": 33.0, "text": "w20"}]
    srt_doc = segments_to_srt(segs)
    assert "00:00:30,000 --> 00:00:31,500" in srt_doc

    # round-trips through our SRT parser
    from hirest_tpu.data.srt import parse_srt

    parsed = parse_srt(srt_doc)
    assert parsed[0].start_seconds == 30 and parsed[1].end_seconds == 33


def test_read_wav_roundtrip(tmp_path):
    import wave

    from hirest_tpu.extraction.asr import read_wav_mono16k

    path = tmp_path / "t.wav"
    samples = (np.sin(np.arange(1600) / 10) * 0.5 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    audio = read_wav_mono16k(str(path))
    assert audio.shape == (1600,)
    np.testing.assert_allclose(audio, samples / 32768.0, atol=1e-6)
