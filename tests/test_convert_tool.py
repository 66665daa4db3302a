"""tools/convert_checkpoints.py CLI: every kind converts a synthetic torch
checkpoint into a loadable msgpack."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def run_tool(kind, src, out):
    r = subprocess.run([sys.executable, "tools/convert_checkpoints.py",
                        "--kind", kind, "--src", str(src), "--out", str(out)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    from flax import serialization

    with open(out, "rb") as f:
        return serialization.msgpack_restore(f.read())


@pytest.mark.slow
def test_convert_minilm_kind(tmp_path):
    from transformers import BertConfig, BertModel

    hf = BertModel(BertConfig(vocab_size=30522, hidden_size=384,
                              num_hidden_layers=6, num_attention_heads=12,
                              intermediate_size=1536, pad_token_id=0)).eval()
    src = tmp_path / "minilm.pt"
    torch.save(hf.state_dict(), src)
    tree = run_tool("minilm", src, tmp_path / "minilm.msgpack")
    assert tree["encoder"]["word_embeddings"]["embedding"].shape == (30522, 384)
    assert "layer_5_ffn" in tree["encoder"]


@pytest.mark.slow
def test_convert_whisper_kind(tmp_path):
    from transformers import WhisperConfig as HFConfig, WhisperModel

    # full small.en dims are heavy; the tool uses the default WhisperConfig,
    # so build a matching-dims random checkpoint
    from hirest_tpu.models.whisper import WhisperConfig

    cfg = WhisperConfig()
    hf = WhisperModel(HFConfig(
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.heads, decoder_attention_heads=cfg.heads,
        encoder_ffn_dim=cfg.ffn_dim, decoder_ffn_dim=cfg.ffn_dim,
        num_mel_bins=cfg.num_mel_bins,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        vocab_size=cfg.vocab_size, pad_token_id=0)).eval()
    src = tmp_path / "whisper.pt"
    torch.save(hf.state_dict(), src)
    tree = run_tool("whisper", src, tmp_path / "whisper.msgpack")
    assert tree["decoder"]["embed_tokens"].shape == (cfg.vocab_size, cfg.d_model)
    assert f"layers_{cfg.encoder_layers - 1}" in tree["encoder"]
