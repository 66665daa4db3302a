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

import jax
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


class AttnProj(nn.Module):
    """q/k/v projections with the same param layout as the joint
    MultiHeadAttention (Dense children named query/key/value), exposed
    separately so the KV-cached decode path can reuse the k/v weights."""

    inner: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query = nn.Dense(self.inner, dtype=self.dtype)
        self.key = nn.Dense(self.inner, dtype=self.dtype)
        self.value = nn.Dense(self.inner, dtype=self.dtype)

    def __call__(self, q_in, kv_in):
        return self.query(q_in), self.key(kv_in), self.value(kv_in)


class DecoderLayer(nn.Module):
    heads: int
    hidden_size: int
    intermediate_size: int
    norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.slf_attn = AttnProj(self.hidden_size, dtype=self.dtype)
        self.slf_output = BertSelfOutput(norm_eps=self.norm_eps, dtype=self.dtype)
        self.enc_attn = AttnProj(self.hidden_size, dtype=self.dtype)
        self.enc_output = BertSelfOutput(norm_eps=self.norm_eps, dtype=self.dtype)
        self.ffn = BertFfn(self.intermediate_size, norm_eps=self.norm_eps,
                           dtype=self.dtype)

    def _attend(self, q, k, v, bias):
        from hirest_tpu.models.layers import (dot_product_attention, merge_heads,
                                              split_heads)

        hd = self.hidden_size // self.heads
        out = dot_product_attention(split_heads(q, self.heads),
                                    split_heads(k, self.heads),
                                    split_heads(v, self.heads),
                                    bias, hd ** -0.5, dtype=self.dtype)
        return merge_heads(out)

    def __call__(self, x, encoder_out, self_bias, cross_bias=None):
        q, k, v = self.slf_attn(x, x)
        att = self._attend(q, k, v, self_bias)
        x = self.slf_output(att, x)
        q, k, v = self.enc_attn(x, encoder_out)
        att = self._attend(q, k, v, cross_bias)
        x = self.enc_output(att, x)
        return self.ffn(x)

    def step(self, x, pos, enc_k, enc_v, cache_k, cache_v):
        """One-token decode: x [N, 1, H], pos scalar int, enc_{k,v}
        precomputed cross-attention projections [N, T, H], cache_{k,v}
        [N, L, H] self-attention caches. Returns (y [N,1,H], cache_k, cache_v)."""
        q, k, v = self.slf_attn(x, x)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k, (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v, (0, pos, 0))
        # mask out cache slots beyond pos (causal over the filled prefix)
        length = cache_k.shape[1]
        key_ids = jnp.arange(length)[None, None, None, :]
        bias = jnp.where(key_ids <= pos, 0.0, -10000.0)
        att = self._attend(q, cache_k, cache_v, bias)
        x = self.slf_output(att, x)
        q = self.enc_attn.query(x)
        att = self._attend(q, enc_k, enc_v, None)
        x = self.enc_output(att, x)
        return self.ffn(x), cache_k, cache_v

    def cross_kv(self, encoder_out):
        return self.enc_attn.key(encoder_out), self.enc_attn.value(encoder_out)


class CaptionDecoder(nn.Module):
    """Teacher-forced decode: token ids [B, L] + encoder outs [B, T, H]
    -> vocab logits [B, L, V]. Weights of the classifier are tied to the
    word embedding table (module_decoder.py:167-183,294-302).

    `decode_step` is the KV-cached single-token path used by beam search:
    cross-attention K/V are projected once per sequence, self-attention K/V
    accumulate in fixed [N, L, H] caches — O(1) work per emitted token
    instead of the reference's full-prefix re-decode per step
    (clip4caption/train.py:559-567)."""

    config: DecoderConfig = DecoderConfig()
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True
    dropout_rate: float = 0.1

    def setup(self):
        cfg = self.config
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size))
        self.position_embeddings = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_target_embeddings, cfg.hidden_size))
        self.emb_LayerNorm = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)
        self.layers = [DecoderLayer(heads=cfg.num_attention_heads,
                                    hidden_size=cfg.hidden_size,
                                    intermediate_size=cfg.intermediate_size,
                                    norm_eps=cfg.norm_eps, dtype=self.dtype,
                                    name=f"layer_{i}")
                       for i in range(cfg.num_decoder_layers)]
        self.cls_transform = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.cls_LayerNorm = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype)
        self.cls_bias = self.param("cls_bias", nn.initializers.zeros,
                                   (cfg.vocab_size,))

    def _classify(self, h):
        h = self.cls_transform(h)
        h = gelu(h)
        h = self.cls_LayerNorm(h)
        word_emb = jnp.asarray(self.word_embeddings)
        logits = h @ word_emb.T.astype(self.dtype) \
            + jnp.asarray(self.cls_bias).astype(self.dtype)
        return logits.astype(jnp.float32)

    def __call__(self, input_ids: jnp.ndarray, encoder_out: jnp.ndarray,
                 answer_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        b, length = input_ids.shape

        x = jnp.asarray(self.word_embeddings)[input_ids].astype(self.dtype) \
            + jnp.asarray(self.position_embeddings)[None, :length].astype(self.dtype)
        x = self.emb_LayerNorm(x)
        x = self.dropout(x)

        # Reference mask composition (module_decoder.py:389-396): causal triu
        # OR'd with the inverted answer mask, then scaled by -10000.
        tri = jnp.triu(jnp.ones((length, length), dtype=jnp.float32), k=1)
        self_mask = tri[None, None]
        if answer_mask is not None:
            inv = (1.0 - answer_mask.astype(jnp.float32))[:, None, None, :]
            self_mask = jnp.minimum(inv + self_mask, 1.0)
        self_bias = self_mask * -10000.0

        for layer in self.layers:
            x = layer(x, encoder_out, self_bias)
        return self._classify(x)

    # -- KV-cached decoding ------------------------------------------------

    def init_cache(self, batch: int, max_len: int):
        cfg = self.config
        shape = (batch, max_len, cfg.hidden_size)
        return tuple((jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))
                     for _ in self.layers)

    def cross_kv(self, encoder_out):
        return tuple(layer.cross_kv(encoder_out) for layer in self.layers)

    def decode_step(self, tok_ids: jnp.ndarray, pos, cross_kv, cache):
        """tok_ids [N] tokens at position `pos` -> (logits [N, V], cache)."""
        x = jnp.asarray(self.word_embeddings)[tok_ids].astype(self.dtype)[:, None, :] \
            + jax.lax.dynamic_slice_in_dim(
                jnp.asarray(self.position_embeddings), pos, 1, axis=0)[None].astype(self.dtype)
        x = self.emb_LayerNorm(x)

        new_cache = []
        for layer, (enc_k, enc_v), (ck, cv) in zip(self.layers, cross_kv, cache):
            x, ck, cv = layer.step(x, pos, enc_k, enc_v, ck, cv)
            new_cache.append((ck, cv))
        return self._classify(x)[:, 0], tuple(new_cache)
