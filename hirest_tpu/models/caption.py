"""CLIP4Caption-style visual encoder and caption decoder in flax.

Architecture parity targets:
- VisualEncoder: Linear(feature->768) embedding + learned positions +
  LayerNorm(1e-12), then BERT-style post-LN self-attention layers
  (reference clip4caption/modules/module_visual.py:104-264,389-424). The
  joint model calls it with a constant attention mask, which is
  softmax-shift-invariant — i.e. effectively FULL attention over all frames
  including padding (reference modeling.py:208 passes zeros) — so no frame
  mask is applied here by design.
- CaptionDecoder: BERT-embedding decoder with causal self-attention,
  cross-attention to the encoder output, erf-GELU MLP, and a
  tied-word-embedding classifier head
  (reference clip4caption/modules/module_decoder.py:112-406). The
  reference's cross-attention encoder mask is likewise a constant
  (modeling.py:505,591 passes zeros) — full cross-attention.

All LayerNorms use eps=1e-12 ("TF-style", until_module.py:40-53 — both
torch and flax put eps inside the sqrt, so plain LayerNorm matches).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from hirest_tpu.config import DecoderConfig, VisualEncoderConfig
from hirest_tpu.models.layers import MultiHeadAttention, gelu


class BertSelfOutput(nn.Module):
    """dense -> residual add -> LayerNorm (post-LN)."""

    norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual):
        hidden = nn.Dense(residual.shape[-1], name="dense", dtype=self.dtype)(hidden)
        return nn.LayerNorm(epsilon=self.norm_eps, name="LayerNorm",
                            dtype=self.dtype)(hidden + residual)


class BertFfn(nn.Module):
    intermediate_size: int
    norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.intermediate_size, name="intermediate", dtype=self.dtype)(x)
        h = gelu(h)
        h = nn.Dense(x.shape[-1], name="output", dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=self.norm_eps, name="LayerNorm",
                            dtype=self.dtype)(h + x)


class VisualLayer(nn.Module):
    heads: int
    intermediate_size: int
    norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        att = MultiHeadAttention(num_heads=self.heads, use_out_proj=False,
                                 dtype=self.dtype, name="attention")(x, bias=bias)
        x = BertSelfOutput(norm_eps=self.norm_eps, dtype=self.dtype,
                           name="attention_output")(att, x)
        return BertFfn(self.intermediate_size, norm_eps=self.norm_eps,
                       dtype=self.dtype, name="ffn")(x)


class VisualEncoder(nn.Module):
    """[B, T, feature_dim] frame features -> [B, T, hidden] contextual embeddings."""

    config: VisualEncoderConfig = VisualEncoderConfig()
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        t = feats.shape[1]
        assert t <= cfg.max_position_embeddings, (
            f"sequence {t} exceeds position table {cfg.max_position_embeddings}")
        x = nn.Dense(cfg.hidden_size, name="word_embeddings", dtype=self.dtype)(feats)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = x + pos[None, :t].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="emb_LayerNorm", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)(x)
        for i in range(cfg.num_hidden_layers):
            x = VisualLayer(heads=cfg.num_attention_heads,
                            intermediate_size=cfg.intermediate_size,
                            norm_eps=cfg.norm_eps, dtype=self.dtype,
                            name=f"layer_{i}")(x)
        return x


class DecoderLayer(nn.Module):
    heads: int
    intermediate_size: int
    norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_out, self_bias, cross_bias=None):
        att = MultiHeadAttention(num_heads=self.heads, use_out_proj=False,
                                 dtype=self.dtype, name="slf_attn")(x, bias=self_bias)
        x = BertSelfOutput(norm_eps=self.norm_eps, dtype=self.dtype,
                           name="slf_output")(att, x)
        att = MultiHeadAttention(num_heads=self.heads, use_out_proj=False,
                                 dtype=self.dtype, name="enc_attn")(x, kv_in=encoder_out, bias=cross_bias)
        x = BertSelfOutput(norm_eps=self.norm_eps, dtype=self.dtype,
                           name="enc_output")(att, x)
        return BertFfn(self.intermediate_size, norm_eps=self.norm_eps,
                       dtype=self.dtype, name="ffn")(x)


class CaptionDecoder(nn.Module):
    """Teacher-forced decode: token ids [B, L] + encoder outs [B, T, H]
    -> vocab logits [B, L, V]. Weights of the classifier are tied to the
    word embedding table (module_decoder.py:167-183,294-302)."""

    config: DecoderConfig = DecoderConfig()
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, encoder_out: jnp.ndarray,
                 answer_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        b, length = input_ids.shape

        word_emb = self.param("word_embeddings", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.hidden_size))
        pos_emb = self.param("position_embeddings", nn.initializers.normal(0.02),
                             (cfg.max_target_embeddings, cfg.hidden_size))
        x = word_emb[input_ids].astype(self.dtype) + pos_emb[None, :length].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="emb_LayerNorm", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)(x)

        # Reference mask composition (module_decoder.py:389-396): causal triu
        # OR'd with the inverted answer mask, then scaled by -10000.
        tri = jnp.triu(jnp.ones((length, length), dtype=jnp.float32), k=1)
        self_mask = tri[None, None]
        if answer_mask is not None:
            inv = (1.0 - answer_mask.astype(jnp.float32))[:, None, None, :]
            self_mask = jnp.minimum(inv + self_mask, 1.0)
        self_bias = self_mask * -10000.0

        for i in range(cfg.num_decoder_layers):
            x = DecoderLayer(heads=cfg.num_attention_heads,
                             intermediate_size=cfg.intermediate_size,
                             norm_eps=cfg.norm_eps, dtype=self.dtype,
                             name=f"layer_{i}")(x, encoder_out, self_bias)

        # Classifier: transform (dense + gelu + LN) then tied-embedding matmul
        h = nn.Dense(cfg.hidden_size, name="cls_transform", dtype=self.dtype)(x)
        h = gelu(h)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="cls_LayerNorm", dtype=self.dtype)(h)
        cls_bias = self.param("cls_bias", nn.initializers.zeros, (cfg.vocab_size,))
        logits = h @ word_emb.T.astype(self.dtype) + cls_bias.astype(self.dtype)
        return logits.astype(jnp.float32)
