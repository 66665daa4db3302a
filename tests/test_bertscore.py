"""JAX BERTScore: algorithm properties + end-to-end plugin flow."""

import numpy as np
import pytest

from hirest_tpu.eval.bertscore import bertscore_pairs


def test_bertscore_pairs_identical_is_one():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(2, 6, 8)).astype(np.float32)
    mask = np.ones((2, 6), bool)
    mask[1, 4:] = False
    p, r, f = bertscore_pairs(emb, mask, emb, mask)
    np.testing.assert_allclose(p, 1.0, rtol=1e-5)
    np.testing.assert_allclose(f, 1.0, rtol=1e-5)


def test_bertscore_prefers_related():
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(1, 5, 8)).astype(np.float32)
    mask = np.ones((1, 5), bool)
    near = ref + rng.normal(size=ref.shape).astype(np.float32) * 0.1
    far = rng.normal(size=ref.shape).astype(np.float32)
    _, _, f_near = bertscore_pairs(near, mask, ref, mask)
    _, _, f_far = bertscore_pairs(far, mask, ref, mask)
    assert f_near[0] > f_far[0]


def test_bertscore_asymmetric_lengths():
    rng = np.random.default_rng(2)
    cand = rng.normal(size=(1, 3, 8)).astype(np.float32)
    ref = rng.normal(size=(1, 7, 8)).astype(np.float32)
    cm = np.ones((1, 3), bool)
    rm = np.ones((1, 7), bool)
    p, r, f = bertscore_pairs(cand, cm, ref, rm)
    # cosine-bounded: F1 of cosine-valued P/R can never leave [-1, 1]
    # (an exploded epsilon-clip denominator WOULD leave it)
    assert -1.0 <= f[0] <= 1.0
    assert np.isfinite(p[0]) and np.isfinite(r[0])


@pytest.mark.slow
def test_make_bertscore_fn_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from hirest_tpu.eval.bertscore import make_bertscore_fn
    from hirest_tpu.models.minilm import MiniLmConfig

    cfg = MiniLmConfig(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                       num_attention_heads=4, intermediate_size=32,
                       max_position_embeddings=32)
    hf = BertModel(BertConfig(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                              num_attention_heads=4, intermediate_size=32,
                              max_position_embeddings=32, pad_token_id=0)).eval()
    torch.save(hf.state_dict(), tmp_path / "bert.pt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "add", "salt", "mix", "water", "the", "pan"] + [f"x{i}" for i in range(29)]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    fn = make_bertscore_fn(str(tmp_path / "bert.pt"), str(tmp_path / "vocab.txt"),
                           max_length=16, config=cfg)
    same = fn(["add salt and mix"], ["add salt and mix"])
    diff = fn(["add salt and mix"], ["the pan water"])
    assert same == pytest.approx(1.0, abs=1e-4)
    assert diff < same

    # plugs into the step-captioning evaluator
    from hirest_tpu.eval.captions import evaluate_step_captions

    gt = {"v": {"captions": [{"sentence": "add salt", "start": 0, "end": 2}]}}
    pred = {"v": {"captions": [{"sentence": "add salt"}]}}
    res = evaluate_step_captions(gt, pred, bertscore_fn=fn)
    assert res["all"]["BERTScore_F1"] == pytest.approx(1.0, abs=1e-4)


def test_bertscore_f1_negative_cosines():
    """All-negative best cosines give p = r < 0; F1 must be the plain
    2pr/(p+r) (negative), not an exploded value from clipping a negative
    denominator up to epsilon."""
    import numpy as np

    from hirest_tpu.eval.bertscore import bertscore_pairs

    cand = np.ones((1, 2, 4), np.float32)
    ref = -np.ones((1, 2, 4), np.float32)   # cosine exactly -1 everywhere
    mask = np.ones((1, 2), bool)
    p, r, f1 = bertscore_pairs(cand, mask, ref, mask)
    assert p[0] == pytest.approx(-1.0) and r[0] == pytest.approx(-1.0)
    assert f1[0] == pytest.approx(-1.0)     # 2*1/(-2), not ~1e9
