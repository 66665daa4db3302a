"""MiniLM sentence encoder in flax (all-MiniLM-L6-v2 family).

The reference embeds ASR subtitle segments with sentence-transformers
all-MiniLM-L6-v2 (384-d; extraction/whisper_ASR/extract_ASR_embedding.py).
This is a standard HF BERT encoder (6 layers, hidden 384, 12 heads,
intermediate 1536) followed by attention-mask mean pooling and L2
normalization — implemented here with an HF-checkpoint converter and parity
tests against transformers.BertModel, so segment embedding runs on TPU with
no sentence-transformers download.

Tokenization uses the WordPiece tokenizer (same vocab.txt as BERT-uncased).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hirest_tpu.models.caption import BertFfn, BertSelfOutput
from hirest_tpu.models.layers import MultiHeadAttention, additive_mask


@dataclass(frozen=True)
class MiniLmConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    norm_eps: float = 1e-12


class MiniLmEncoder(nn.Module):
    """token ids + attention mask [B, L] -> mean-pooled normalized [B, H]."""

    config: MiniLmConfig = MiniLmConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 pool: bool = True,
                 token_type_ids: jnp.ndarray | None = None) -> jnp.ndarray:
        cfg = self.config
        b, length = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                     dtype=self.dtype)(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        tok_type = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                              (cfg.type_vocab_size, cfg.hidden_size))
        # segment embeddings: sentence-pair callers (the NLI cross-encoder)
        # pass explicit ids; single-sentence callers keep the all-zeros path
        if token_type_ids is None:
            seg = tok_type[0].astype(self.dtype)
        else:
            seg = tok_type.astype(self.dtype)[token_type_ids]
        x = x + pos[None, :length].astype(self.dtype) + seg
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="emb_LayerNorm",
                         dtype=self.dtype)(x)

        bias = additive_mask(attention_mask, neg=-10000.0)
        for i in range(cfg.num_hidden_layers):
            att = MultiHeadAttention(num_heads=cfg.num_attention_heads,
                                     use_out_proj=False, dtype=self.dtype,
                                     name=f"layer_{i}_attention")(x, bias=bias)
            x = BertSelfOutput(norm_eps=cfg.norm_eps, dtype=self.dtype,
                               name=f"layer_{i}_attention_output")(att, x)
            x = BertFfn(cfg.intermediate_size, norm_eps=cfg.norm_eps,
                        dtype=self.dtype, name=f"layer_{i}_ffn")(x)
        if not pool:
            return x
        # sentence-transformers mean pooling + L2 normalize
        m = attention_mask.astype(jnp.float32)[..., None]
        pooled = (x.astype(jnp.float32) * m).sum(1) / jnp.clip(m.sum(1), 1e-9, None)
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


def convert_minilm(sd, cfg: MiniLmConfig = MiniLmConfig()) -> dict:
    """HF BertModel state dict (bare or 'bert.'-prefixed, or
    sentence-transformers' '0.auto_model.' prefix) -> MiniLmEncoder params."""
    from hirest_tpu.models.convert import _ln, _linear, _np

    for prefix in ("0.auto_model.", "bert.", ""):
        if any(k.startswith(prefix + "embeddings.") for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break

    p = {
        "word_embeddings": {"embedding": _np(sd, "embeddings.word_embeddings.weight")},
        "position_embeddings": _np(sd, "embeddings.position_embeddings.weight"),
        "token_type_embeddings": _np(sd, "embeddings.token_type_embeddings.weight"),
        "emb_LayerNorm": _ln(sd, "embeddings.LayerNorm"),
    }
    for i in range(cfg.num_hidden_layers):
        r = f"encoder.layer.{i}"
        p[f"layer_{i}_attention"] = {
            "query": _linear(sd, f"{r}.attention.self.query"),
            "key": _linear(sd, f"{r}.attention.self.key"),
            "value": _linear(sd, f"{r}.attention.self.value"),
        }
        p[f"layer_{i}_attention_output"] = {
            "dense": _linear(sd, f"{r}.attention.output.dense"),
            "LayerNorm": _ln(sd, f"{r}.attention.output.LayerNorm"),
        }
        p[f"layer_{i}_ffn"] = {
            "intermediate": _linear(sd, f"{r}.intermediate.dense"),
            "output": _linear(sd, f"{r}.output.dense"),
            "LayerNorm": _ln(sd, f"{r}.output.LayerNorm"),
        }
    return p


def make_minilm_embedder(ckpt_path: str, vocab_path: str, max_length: int = 128,
                         config: MiniLmConfig = MiniLmConfig()):
    """Build a `texts -> [N, 384] normalized embeddings` callable on the JAX
    MiniLM (jitted, fixed [batch, max_length] shape)."""
    import jax

    from hirest_tpu.models.convert import load_torch_ckpt
    from hirest_tpu.tokenizers import WordPieceTokenizer

    tok = WordPieceTokenizer(vocab_path)
    cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
    model = MiniLmEncoder(config)
    params = {"params": convert_minilm(load_torch_ckpt(ckpt_path), config)}
    apply = jax.jit(lambda p, ids, mask: model.apply(p, ids, mask))

    def embed(texts):
        n = len(texts)
        # pad the batch to a power-of-two bucket: callers pass one batch
        # per video (e.g. its SRT segment count), and a fresh [n, L] shape
        # every call would recompile the encoder per video
        cap = max(8, 1 << (n - 1).bit_length())
        ids = np.zeros((cap, max_length), np.int32)
        mask = np.zeros((cap, max_length), np.int32)
        for i, text in enumerate(texts):
            toks = [cls_id] + tok.convert_tokens_to_ids(
                tok.tokenize(text))[: max_length - 2] + [sep_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        # pad rows get a bare [CLS][SEP] mask so the row mean is defined
        mask[n:, :2] = 1
        out = np.asarray(apply(params, jnp.asarray(ids), jnp.asarray(mask)))
        return out[:n]

    return embed
