"""Caption pretraining loop + contrastive losses."""

import numpy as np
import pytest

import jax.numpy as jnp

from hirest_tpu.config import DecoderConfig, VisualEncoderConfig
from hirest_tpu.train.contrastive import cross_en, max_margin_ranking, milnce
from hirest_tpu.train.pretrain import (
    init_moment_model_from_pretrain,
    pretrain_caption_generator,
)


def test_cross_en_prefers_diagonal():
    good = jnp.eye(4) * 10.0
    bad = jnp.ones((4, 4))
    assert float(cross_en(good)) < float(cross_en(bad))
    # parity with torch-style formula: softmax rows, -log diag mean
    import math

    s = np.array([[2.0, 0.0], [0.0, 2.0]])
    want = -math.log(math.exp(2) / (math.exp(2) + 1))
    assert float(cross_en(jnp.asarray(s))) == pytest.approx(want, rel=1e-6)


def test_milnce_and_maxmargin_ordering():
    good = jnp.eye(6) * 5.0
    bad = -jnp.eye(6) * 5.0 + 1.0
    assert float(milnce(good)) < float(milnce(bad))
    assert float(max_margin_ranking(good)) < float(max_margin_ranking(bad))
    assert float(max_margin_ranking(good)) == 0.0  # margin satisfied


@pytest.mark.slow
def test_pretrain_loop_reduces_loss_and_grafts(capsys):
    rng = np.random.default_rng(0)
    vocab, max_words, max_frames, dim = 30, 8, 6, 16
    examples = []
    for i in range(24):
        cap = rng.integers(5, vocab, size=3)
        in_ids = np.zeros(max_words, np.int32)
        out_ids = np.zeros(max_words, np.int32)
        in_ids[0] = 2
        in_ids[1:4] = cap
        out_ids[:3] = cap
        out_ids[3] = 3
        examples.append({
            "vis_feats": rng.normal(size=(max_frames, dim)).astype(np.float32),
            "input_caption_ids": in_ids,
            "output_caption_ids": out_ids,
            "decoder_mask": (in_ids > 0).astype(np.int32),
        })

    vcfg = VisualEncoderConfig(feature_dim=dim, hidden_size=16,
                               num_hidden_layers=1, num_attention_heads=4,
                               intermediate_size=32, max_position_embeddings=16)
    dcfg = DecoderConfig(vocab_size=vocab, hidden_size=16, num_decoder_layers=1,
                         num_attention_heads=4, intermediate_size=32,
                         max_target_embeddings=16)
    model, params = pretrain_caption_generator(
        examples, vcfg, dcfg, batch_size=8, epochs=4, lr=5e-3, verbose=True)
    out = capsys.readouterr().out
    losses = [float(line.split("loss ")[1]) for line in out.splitlines()
              if "pretrain epoch" in line]
    assert losses[-1] < losses[0], losses

    # graft into a MomentModel param tree
    import jax
    from hirest_tpu.config import JointModelConfig
    from hirest_tpu.models import MomentModel

    mcfg = JointModelConfig(embed_dim=dim, visual=vcfg, decoder=dcfg)
    m = MomentModel(mcfg)
    mp = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 1024)), jnp.zeros((1, 1024)),
                jnp.zeros((1, max_words), jnp.int32), method=MomentModel.init_all)
    grafted = init_moment_model_from_pretrain(dict(mp["params"]), params)
    np.testing.assert_array_equal(
        np.asarray(grafted["decoder"]["word_embeddings"]),
        np.asarray(params["params"]["decoder"]["word_embeddings"]))
    # grafted tree still applies
    outp = m.apply({"params": grafted}, jnp.ones((1, 4, 1024)), jnp.ones((1, 1024)))
    assert outp["start_logits"].shape == (1, 4)
