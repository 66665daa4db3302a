"""NLI cross-encoder parity vs transformers.BertForSequenceClassification
(random weights — the MiniLM oracle pattern), plus the end-to-end
entailment_fn flow from an HF model dir and the label-order remap."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from hirest_tpu.models.minilm import MiniLmConfig  # noqa: E402
from hirest_tpu.models.nli import (  # noqa: E402
    NliCrossEncoder,
    convert_nli,
    encode_pair,
    nli_label_remap,
)

CFG = MiniLmConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64)
HF_LABELS = {0: "CONTRADICTION", 1: "NEUTRAL", 2: "ENTAILMENT"}


@pytest.fixture(scope="module")
def hf_nli():
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
                     num_hidden_layers=CFG.num_hidden_layers,
                     num_attention_heads=CFG.num_attention_heads,
                     intermediate_size=CFG.intermediate_size,
                     max_position_embeddings=CFG.max_position_embeddings,
                     hidden_act="gelu", pad_token_id=0, num_labels=3,
                     id2label=HF_LABELS,
                     label2id={v: k for k, v in HF_LABELS.items()})
    return BertForSequenceClassification(cfg).eval()


def test_nli_logit_parity(hf_nli):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, CFG.vocab_size, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    types = np.zeros((3, 12), np.int64)
    types[:, 6:] = 1  # second segment — exercises token_type embeddings
    with torch.no_grad():
        want = hf_nli(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask),
                      token_type_ids=torch.tensor(types)).logits.numpy()

    sd = {k: v.detach().numpy() for k, v in hf_nli.state_dict().items()}
    params = {"params": convert_nli(sd, CFG)}
    got = np.asarray(NliCrossEncoder(CFG).apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(types, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_label_remap_orders():
    # MNLI-style and SNLI-style orders both land on the reference's
    assert nli_label_remap({0: "contradiction", 1: "neutral",
                            2: "entailment"}) == {0: 1, 1: 2, 2: 0}
    assert nli_label_remap({0: "ENTAILMENT", 1: "CONTRADICTION",
                            2: "NEUTRAL"}) == {0: 0, 1: 1, 2: 2}
    # common HF short forms
    assert nli_label_remap({0: "entail", 1: "contra", 2: "neutra"}) \
        == {0: 0, 1: 1, 2: 2}
    with pytest.raises(AssertionError):
        nli_label_remap({0: "positive", 1: "negative"})


def test_encode_pair_segments_and_truncation():
    class Tok:
        vocab = {"[CLS]": 101, "[SEP]": 102}

        def tokenize(self, text):
            return text.split()

        def convert_tokens_to_ids(self, toks):
            return [200 + len(t) for t in toks]

    ids, types, mask = encode_pair(Tok(), "a bb", "ccc", max_length=16)
    assert ids[:6].tolist() == [101, 201, 202, 102, 203, 102]
    assert types[:6].tolist() == [0, 0, 0, 0, 1, 1]
    assert mask[:6].tolist() == [1] * 6 and mask[6:].sum() == 0
    # longest-first truncation: the longer segment loses tokens first
    ids2, types2, _ = encode_pair(Tok(), "a b c d e f g h", "x y",
                                  max_length=8)
    assert (types2 == 0).sum() + 0 == 8 - (types2[: 8] == 1).sum() \
        and types2[:8].sum() == 3  # [SEP]+2 hypothesis tokens survive
    assert ids2[7] == 102 and (ids2[types2 == 1] != 0).sum() == 3


def test_make_nli_entailment_fn_end_to_end(hf_nli, tmp_path):
    """Full plugin flow from an HF-layout dir; prediction must equal the
    torch model's remapped argmax on the SAME pair encoding."""
    from hirest_tpu.models.nli import make_nli_entailment_fn

    d = tmp_path / "nli"
    d.mkdir()
    torch.save(hf_nli.state_dict(), d / "pytorch_model.bin")
    json.dump({"model_type": "bert", "vocab_size": CFG.vocab_size,
               "hidden_size": CFG.hidden_size,
               "num_hidden_layers": CFG.num_hidden_layers,
               "num_attention_heads": CFG.num_attention_heads,
               "intermediate_size": CFG.intermediate_size,
               "max_position_embeddings": CFG.max_position_embeddings,
               "type_vocab_size": 2, "layer_norm_eps": 1e-12,
               "id2label": {str(k): v for k, v in HF_LABELS.items()}},
              open(d / "config.json", "w"))
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "sat",
             "dog", "ran", "a", "on", "mat"]
    words += [f"w{i}" for i in range(CFG.vocab_size - len(words))]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")

    fn = make_nli_entailment_fn(str(d), max_length=32)
    premise, hypothesis = "the cat sat on a mat", "a dog ran"
    got = fn(premise, hypothesis)

    from hirest_tpu.tokenizers import WordPieceTokenizer

    tok = WordPieceTokenizer(str(d / "vocab.txt"))
    ids, types, mask = encode_pair(tok, premise, hypothesis, 32)
    n = int(mask.sum())
    with torch.no_grad():
        logits = hf_nli(
            input_ids=torch.tensor(ids[None, :n], dtype=torch.long),
            attention_mask=torch.tensor(mask[None, :n], dtype=torch.long),
            token_type_ids=torch.tensor(types[None, :n], dtype=torch.long),
        ).logits[0].numpy()
    want = nli_label_remap(HF_LABELS)[int(logits.argmax())]
    assert got == want
    assert got in (0, 1, 2)


def test_step_captions_warns_loudly_without_entailment(capsys):
    from hirest_tpu.eval.captions import evaluate_step_captions

    gt = {"v1": {"captions": [{"sentence": "Pour the water"}]}}
    pred = {"v1": {"captions": [{"sentence": "pour the water"}]}}
    out = evaluate_step_captions(gt, pred)
    err = capsys.readouterr().err
    assert "Entailment" in err and "SKIPPED" in err
    assert "Entailment" not in out["all"]
    # with a scorer injected: metric present, no warning
    out = evaluate_step_captions(gt, pred, entailment_fn=lambda p, h: 0)
    err = capsys.readouterr().err
    assert "SKIPPED" not in err
    assert out["all"]["Entailment"] == 100.0


def _write_hf_dir(d, hf_nli, id2label=HF_LABELS, fmt="bin"):
    d.mkdir(exist_ok=True)
    if fmt == "safetensors":
        from safetensors.numpy import save_file

        save_file({k: v.detach().numpy().copy()
                   for k, v in hf_nli.state_dict().items()},
                  str(d / "model.safetensors"))
    else:
        torch.save(hf_nli.state_dict(), d / "pytorch_model.bin")
    cfg = {"model_type": "bert", "vocab_size": CFG.vocab_size,
           "hidden_size": CFG.hidden_size,
           "num_hidden_layers": CFG.num_hidden_layers,
           "num_attention_heads": CFG.num_attention_heads,
           "intermediate_size": CFG.intermediate_size,
           "max_position_embeddings": CFG.max_position_embeddings,
           "type_vocab_size": 2, "layer_norm_eps": 1e-12}
    if id2label is not None:
        cfg["id2label"] = {str(k): v for k, v in id2label.items()}
    json.dump(cfg, open(d / "config.json", "w"))
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "sat",
             "dog", "ran", "a", "on", "mat"]
    words += [f"w{i}" for i in range(CFG.vocab_size - len(words))]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    return d


def test_safetensors_checkpoint_loads_and_matches_bin(hf_nli, tmp_path):
    """Modern transformers saves model.safetensors only; the flax path must
    serve it identically to the .bin layout (round-5 review finding)."""
    from hirest_tpu.models.nli import make_nli_entailment_fn

    fn_st = make_nli_entailment_fn(
        str(_write_hf_dir(tmp_path / "st", hf_nli, fmt="safetensors")),
        max_length=32)
    fn_bin = make_nli_entailment_fn(
        str(_write_hf_dir(tmp_path / "bin", hf_nli)), max_length=32)
    pairs = [("the cat sat", "a dog ran"), ("a dog ran", "a dog ran on a mat")]
    assert fn_st.batch(pairs) == fn_bin.batch(pairs)


def test_missing_id2label_raises_and_override_works(hf_nli, tmp_path):
    """No informative id2label must fail loudly — a guessed order can swap
    Entailment and Contradiction — and an explicit override must work."""
    from hirest_tpu.models.nli import make_nli_entailment_fn

    d = _write_hf_dir(tmp_path / "nolabels", hf_nli, id2label=None)
    with pytest.raises(ValueError, match="id2label"):
        make_nli_entailment_fn(str(d), max_length=32)
    # transformers' LABEL_0-style autofill carries no order info either
    d2 = _write_hf_dir(tmp_path / "autolabels", hf_nli,
                       id2label={0: "LABEL_0", 1: "LABEL_1", 2: "LABEL_2"})
    with pytest.raises(ValueError, match="id2label"):
        make_nli_entailment_fn(str(d2), max_length=32)
    fn = make_nli_entailment_fn(str(d), max_length=32, id2label=HF_LABELS)
    ref = make_nli_entailment_fn(
        str(_write_hf_dir(tmp_path / "labeled", hf_nli)), max_length=32)
    assert fn("the cat sat", "a dog ran") == ref("the cat sat", "a dog ran")


def test_missing_checkpoint_raises_filenotfound(hf_nli, tmp_path):
    from hirest_tpu.models.nli import make_nli_entailment_fn

    d = _write_hf_dir(tmp_path / "empty", hf_nli)
    (d / "pytorch_model.bin").unlink()
    with pytest.raises(FileNotFoundError, match="model.safetensors"):
        make_nli_entailment_fn(str(d), max_length=32)


def test_batch_matches_per_pair_and_evaluator_uses_it(hf_nli, tmp_path):
    """fn.batch must agree with per-pair calls (pad rows discarded), and
    evaluate_step_captions must route through it when present."""
    from hirest_tpu.eval.captions import evaluate_step_captions
    from hirest_tpu.models.nli import make_nli_entailment_fn

    fn = make_nli_entailment_fn(
        str(_write_hf_dir(tmp_path / "nli", hf_nli)), max_length=32)
    pairs = [("the cat sat on a mat", "a dog ran"),
             ("a dog ran", "the cat sat"),
             ("the cat", "the cat"),
             ("a on the", "mat mat mat"),
             ("sat sat", "ran ran a")]
    assert fn.batch(pairs) == [fn(p, h) for p, h in pairs]

    calls = {"batch": 0, "single": 0}

    def single(p, h):
        calls["single"] += 1
        return 0

    def batched(ps):
        calls["batch"] += 1
        return [0] * len(ps)

    single.batch = batched
    gt = {"v1": {"captions": [{"sentence": "Pour the water"},
                              {"sentence": "Stir the pot"}]}}
    pred = {"v1": {"captions": [{"sentence": "pour the water"},
                                {"sentence": "stir it"}]}}
    out = evaluate_step_captions(gt, pred, entailment_fn=single)
    assert calls == {"batch": 1, "single": 0}
    assert out["all"]["Entailment"] == 100.0


def test_step_captions_coverage_error_names_missing_videos():
    """GT videos absent from predictions must fail with a diagnostic (the
    reference dies on a bare KeyError at the same spot: evaluate.py:234)."""
    from hirest_tpu.eval.captions import evaluate_step_captions

    gt = {"v1": {"captions": [{"sentence": "Pour the water"}]},
          "v2": {"captions": [{"sentence": "Stir"}, {"sentence": "Serve"}]}}
    pred = {"v1": {"captions": [{"sentence": "pour"}]},
            "v2": {"captions": [{"sentence": "stir"}]}}  # one slot short
    with pytest.raises(ValueError, match="v2"):
        evaluate_step_captions(gt, pred)
    pred["v2"]["captions"].append({"sentence": "serve"})
    out = evaluate_step_captions(gt, pred)
    assert out["all"]["Total"] == 2
