"""MiniLM-in-flax parity vs transformers.BertModel (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from hirest_tpu.models.minilm import MiniLmConfig, MiniLmEncoder, convert_minilm  # noqa: E402

CFG = MiniLmConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=32)


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
                     num_hidden_layers=CFG.num_hidden_layers,
                     num_attention_heads=CFG.num_attention_heads,
                     intermediate_size=CFG.intermediate_size,
                     max_position_embeddings=CFG.max_position_embeddings,
                     hidden_act="gelu", pad_token_id=0)
    return BertModel(cfg).eval()


def test_minilm_hidden_state_parity(hf_bert):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, CFG.vocab_size, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = hf_bert(input_ids=torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in hf_bert.state_dict().items()}
    params = {"params": convert_minilm(sd, CFG)}
    got = np.asarray(MiniLmEncoder(CFG).apply(params, jnp.asarray(ids, jnp.int32),
                                              jnp.asarray(mask, jnp.int32),
                                              pool=False))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_minilm_pooled_embedding(hf_bert):
    ids = np.array([[2, 5, 7, 3, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    sd = {k: v.detach().numpy() for k, v in hf_bert.state_dict().items()}
    params = {"params": convert_minilm(sd, CFG)}
    emb = np.asarray(MiniLmEncoder(CFG).apply(params, jnp.asarray(ids),
                                              jnp.asarray(mask)))
    assert emb.shape == (1, CFG.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)
    # manual mean-pool check against the unpooled states
    hidden = np.asarray(MiniLmEncoder(CFG).apply(params, jnp.asarray(ids),
                                                 jnp.asarray(mask), pool=False))
    manual = hidden[0, :4].mean(0)
    manual = manual / np.linalg.norm(manual)
    np.testing.assert_allclose(emb[0], manual, rtol=1e-5)
