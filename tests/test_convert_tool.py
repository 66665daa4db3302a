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


def test_convert_whisper_kind(tmp_path):
    from transformers import WhisperConfig as HFConfig, WhisperModel

    # tiny dims: the tool infers the architecture from state-dict shapes
    # (infer_whisper_config), so any size — including this test model and
    # the real tiny/base/small/medium checkpoints — converts unchanged
    hf = WhisperModel(HFConfig(
        d_model=64, encoder_layers=2, decoder_layers=3,
        encoder_attention_heads=1, decoder_attention_heads=1,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        num_mel_bins=80, max_source_positions=1500,
        max_target_positions=448, vocab_size=1000, pad_token_id=0)).eval()
    src = tmp_path / "whisper.pt"
    torch.save(hf.state_dict(), src)
    tree = run_tool("whisper", src, tmp_path / "whisper.msgpack")
    assert tree["decoder"]["embed_tokens"].shape == (1000, 64)
    assert "layers_1" in tree["encoder"]
    assert "layers_2" in tree["decoder"] and "layers_3" not in tree["decoder"]


def test_infer_whisper_config_from_shapes():
    from hirest_tpu.models.whisper import WhisperConfig, infer_whisper_config

    import numpy as np

    cfg = WhisperConfig()  # small.en dims
    sd = {
        "decoder.embed_tokens.weight": np.zeros((cfg.vocab_size, cfg.d_model)),
        "decoder.embed_positions.weight": np.zeros((448, cfg.d_model)),
        "encoder.embed_positions.weight": np.zeros((1500, cfg.d_model)),
        "encoder.conv1.weight": np.zeros((cfg.d_model, 80, 3)),
        "encoder.layers.0.fc1.weight": np.zeros((cfg.ffn_dim, cfg.d_model)),
    }
    for i in range(cfg.encoder_layers):
        sd[f"encoder.layers.{i}.x.weight"] = np.zeros(1)
    for i in range(cfg.decoder_layers):
        sd[f"decoder.layers.{i}.x.weight"] = np.zeros(1)
    assert infer_whisper_config(sd) == cfg
