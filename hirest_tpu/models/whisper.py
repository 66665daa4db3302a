"""Whisper ASR in flax — TPU-native replacement for the reference's
external `openai-whisper` dependency (extraction/whisper_ASR/extract_ASR.py).

Standard Whisper architecture (Radford et al. 2022):
- AudioEncoder: two 1-D convs (k=3; stride 1 then 2) + GELU, sinusoidal
  positions, pre-LN transformer (k-projection has no bias), final LayerNorm.
- TextDecoder: token + learned position embeddings, pre-LN blocks with
  causal self-attention and cross-attention, final LayerNorm, LM head tied
  to the token embedding.

Weight layout follows HuggingFace `WhisperModel` (openai/whisper-* hub
checkpoints); `convert_whisper` maps it onto these modules and parity is
tested against `transformers.WhisperModel` directly. Decoding runs as a
jitted KV-cached scan (greedy here; the shared `beam_search_cached` program
covers beams).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hirest_tpu.models.layers import gelu


@dataclass(frozen=True)
class WhisperConfig:
    """Defaults = whisper small.en."""

    num_mel_bins: int = 80
    d_model: int = 768
    encoder_layers: int = 12
    decoder_layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_source_positions: int = 1500   # 30 s of audio after the stride-2 conv
    max_target_positions: int = 448
    vocab_size: int = 51864            # the .en vocabulary
    norm_eps: float = 1e-5


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal table (also stored in HF checkpoints)."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class _Attn(nn.Module):
    """q/k/v/out projections with Whisper's no-bias k_proj quirk."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.q_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.k_proj = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.dim, dtype=self.dtype)

    def _attend(self, q, k, v, bias):
        from hirest_tpu.models.layers import (dot_product_attention, merge_heads,
                                              split_heads)

        hd = self.dim // self.heads
        out = dot_product_attention(split_heads(q, self.heads),
                                    split_heads(k, self.heads),
                                    split_heads(v, self.heads),
                                    bias, hd ** -0.5, dtype=self.dtype)
        return merge_heads(out)

    def __call__(self, x, kv=None, bias=None):
        kv = x if kv is None else kv
        out = self._attend(self.q_proj(x), self.k_proj(kv), self.v_proj(kv), bias)
        return self.out_proj(out)

    def step(self, x, pos, cache_k, cache_v):
        """Cached causal self-attention for one token: x [N,1,D]."""
        q = self.q_proj(x)
        k = self.k_proj(x)
        v = self.v_proj(x)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k, (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v, (0, pos, 0))
        ids = jnp.arange(cache_k.shape[1])[None, None, None, :]
        bias = jnp.where(ids <= pos, 0.0, -jnp.inf)
        out = self._attend(q, cache_k, cache_v, bias)
        return self.out_proj(out), cache_k, cache_v

    def cross_step(self, x, enc_k, enc_v):
        out = self._attend(self.q_proj(x), enc_k, enc_v, None)
        return self.out_proj(out)

    def cross_kv(self, enc):
        return self.k_proj(enc), self.v_proj(enc)


class EncoderLayer(nn.Module):
    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.self_attn = _Attn(c.d_model, c.heads, dtype=self.dtype)
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)
        self.fc1 = nn.Dense(c.ffn_dim, dtype=self.dtype)
        self.fc2 = nn.Dense(c.d_model, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)

    def __call__(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        return x + self.fc2(gelu(self.fc1(self.final_layer_norm(x))))


class DecoderLayer(nn.Module):
    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.self_attn = _Attn(c.d_model, c.heads, dtype=self.dtype)
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)
        self.encoder_attn = _Attn(c.d_model, c.heads, dtype=self.dtype)
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)
        self.fc1 = nn.Dense(c.ffn_dim, dtype=self.dtype)
        self.fc2 = nn.Dense(c.d_model, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)

    def __call__(self, x, enc, self_bias):
        x = x + self.self_attn(self.self_attn_layer_norm(x), bias=self_bias)
        x = x + self.encoder_attn(self.encoder_attn_layer_norm(x), kv=enc)
        return x + self.fc2(gelu(self.fc1(self.final_layer_norm(x))))

    def step(self, x, pos, enc_k, enc_v, cache_k, cache_v):
        h, cache_k, cache_v = self.self_attn.step(
            self.self_attn_layer_norm(x), pos, cache_k, cache_v)
        x = x + h
        x = x + self.encoder_attn.cross_step(self.encoder_attn_layer_norm(x),
                                             enc_k, enc_v)
        return x + self.fc2(gelu(self.fc1(self.final_layer_norm(x)))), cache_k, cache_v


class WhisperEncoder(nn.Module):
    """log-mel features [B, T_mel, 80] (time-major) -> [B, T_mel/2, D]."""

    cfg: WhisperConfig = WhisperConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.conv1 = nn.Conv(c.d_model, kernel_size=(3,), padding=1, dtype=self.dtype)
        self.conv2 = nn.Conv(c.d_model, kernel_size=(3,), strides=(2,), padding=1,
                             dtype=self.dtype)
        self.layers = [EncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(c.encoder_layers)]
        self.layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = gelu(self.conv1(mel.astype(self.dtype)))
        x = gelu(self.conv2(x))
        pos = sinusoids(self.cfg.max_source_positions, self.cfg.d_model)
        x = x + jnp.asarray(pos[: x.shape[1]], self.dtype)[None]
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


class WhisperDecoder(nn.Module):
    """token ids [B, L] + encoder states [B, T, D] -> logits [B, L, V]."""

    cfg: WhisperConfig = WhisperConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param("embed_tokens", nn.initializers.normal(0.02),
                                       (c.vocab_size, c.d_model))
        self.embed_positions = self.param("embed_positions",
                                          nn.initializers.normal(0.02),
                                          (c.max_target_positions, c.d_model))
        self.layers = [DecoderLayer(c, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(c.decoder_layers)]
        self.layer_norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype)

    def _head(self, x):
        x = self.layer_norm(x)
        emb = jnp.asarray(self.embed_tokens)
        return (x @ emb.T.astype(self.dtype)).astype(jnp.float32)

    def __call__(self, ids: jnp.ndarray, enc: jnp.ndarray) -> jnp.ndarray:
        b, length = ids.shape
        x = jnp.asarray(self.embed_tokens)[ids].astype(self.dtype) \
            + jnp.asarray(self.embed_positions)[None, :length].astype(self.dtype)
        bias = jnp.triu(jnp.full((length, length), -jnp.inf, jnp.float32), k=1)[None, None]
        for layer in self.layers:
            x = layer(x, enc, bias)
        return self._head(x)

    # -- cached decoding -----------------------------------------------

    def init_cache(self, batch: int, max_len: int):
        c = self.cfg
        shape = (batch, max_len, c.d_model)
        return tuple((jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))
                     for _ in self.layers)

    def cross_kv(self, enc):
        return tuple(layer.encoder_attn.cross_kv(enc) for layer in self.layers)

    def decode_step(self, tok_ids, pos, cross_kv, cache):
        x = jnp.asarray(self.embed_tokens)[tok_ids].astype(self.dtype)[:, None, :] \
            + jax.lax.dynamic_slice_in_dim(
                jnp.asarray(self.embed_positions), pos, 1, axis=0)[None].astype(self.dtype)
        new_cache = []
        for layer, (ek, ev), (ck, cv) in zip(self.layers, cross_kv, cache):
            x, ck, cv = layer.step(x, pos, ek, ev, ck, cv)
            new_cache.append((ck, cv))
        return self._head(x)[:, 0], tuple(new_cache)


_greedy_jit_cache: dict = {}


def greedy_decode(decoder: WhisperDecoder, params, enc, prompt_ids: np.ndarray,
                  max_new_tokens: int, eot_id: int):
    """Jit-compiled greedy generation with KV cache. prompt_ids [B, P] seeds
    the decode (Whisper's <sot> [task tokens] prefix); returns [B, P+N].

    The jitted program is cached per (decoder, shape) and takes params as an
    EXPLICIT argument: rebuilding jax.jit(run) per call would retrace and
    remote-recompile for every 30 s audio chunk, and closure-captured
    weights become HLO constants (the >10-min compile-stall failure mode
    eva_scan.py documents). The decoder object is kept in the cache entry
    so its id() cannot be recycled."""
    b, p = prompt_ids.shape
    total = p + max_new_tokens
    key = (id(decoder), b, p, total, eot_id)
    if key in _greedy_jit_cache:
        return np.asarray(_greedy_jit_cache[key][1](
            params, enc, jnp.asarray(prompt_ids)))

    def run(params, enc, prompt):
        cross = decoder.apply(params, enc, method=WhisperDecoder.cross_kv)
        cache = decoder.apply(params, b, total, method=WhisperDecoder.init_cache)
        ids0 = jnp.zeros((b, total), jnp.int32)
        ids0 = jax.lax.dynamic_update_slice(ids0, prompt, (0, 0))

        def step(carry, t):
            ids, cache, done = carry
            logits, cache = decoder.apply(params, ids[:, t], t, cross, cache,
                                          method=WhisperDecoder.decode_step)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # within the prompt, feed the given tokens; after EOT, hold EOT
            in_prompt = t + 1 < p
            cur = jnp.where(done, eot_id, nxt)
            ids = jax.lax.cond(
                in_prompt, lambda i: i,
                lambda i: i.at[:, t + 1].set(cur), ids)
            done = done | (~in_prompt & (nxt == eot_id))
            return (ids, cache, done), None

        (ids, _, _), _ = jax.lax.scan(step, (ids0, cache,
                                             jnp.zeros((b,), bool)),
                                      jnp.arange(total - 1))
        return ids

    _greedy_jit_cache[key] = (decoder, jax.jit(run))
    return np.asarray(_greedy_jit_cache[key][1](
        params, enc, jnp.asarray(prompt_ids)))


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def infer_whisper_config(sd) -> WhisperConfig:
    """Derive the architecture from state-dict shapes (the same shape
    sniffing the reference uses for CLIP checkpoints, EVA_clip/model.py
    build_model) so any whisper size (tiny/base/small/medium, .en or
    multilingual) converts without a config flag. Head count follows the
    universal whisper head width of 64."""
    get = lambda k: sd[k].shape  # noqa: E731
    vocab, d_model = get("decoder.embed_tokens.weight")
    max_tgt = get("decoder.embed_positions.weight")[0]
    num_mel = get("encoder.conv1.weight")[1]
    ffn = get("encoder.layers.0.fc1.weight")[0]

    def n_layers(prefix):
        ns = {int(k.split(".")[2]) for k in sd
              if k.startswith(prefix) and k.split(".")[2].isdigit()}
        return max(ns) + 1

    if "encoder.embed_positions.weight" in sd:
        max_src = get("encoder.embed_positions.weight")[0]
    else:
        max_src = 1500
    return WhisperConfig(
        num_mel_bins=int(num_mel), d_model=int(d_model),
        encoder_layers=n_layers("encoder.layers."),
        decoder_layers=n_layers("decoder.layers."),
        heads=int(d_model) // 64, ffn_dim=int(ffn),
        max_source_positions=int(max_src),
        max_target_positions=int(max_tgt), vocab_size=int(vocab))


def _attn_params(sd, prefix):
    from hirest_tpu.models.convert import _linear, _np

    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": {"kernel": _np(sd, f"{prefix}.k_proj.weight").T},
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_whisper_encoder(sd, cfg: WhisperConfig) -> dict:
    """HF WhisperModel state dict (encoder.*) -> WhisperEncoder params."""
    from hirest_tpu.models.convert import _ln, _np

    p = {
        # torch conv1d weight [out, in, k] -> flax [k, in, out]
        "conv1": {"kernel": _np(sd, "encoder.conv1.weight").transpose(2, 1, 0),
                  "bias": _np(sd, "encoder.conv1.bias")},
        "conv2": {"kernel": _np(sd, "encoder.conv2.weight").transpose(2, 1, 0),
                  "bias": _np(sd, "encoder.conv2.bias")},
        "layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        r = f"encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _attn_params(sd, f"{r}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{r}.self_attn_layer_norm"),
            "fc1": {"kernel": _np(sd, f"{r}.fc1.weight").T,
                    "bias": _np(sd, f"{r}.fc1.bias")},
            "fc2": {"kernel": _np(sd, f"{r}.fc2.weight").T,
                    "bias": _np(sd, f"{r}.fc2.bias")},
            "final_layer_norm": _ln(sd, f"{r}.final_layer_norm"),
        }
    return p


def convert_whisper_decoder(sd, cfg: WhisperConfig) -> dict:
    from hirest_tpu.models.convert import _ln, _np

    p = {
        "embed_tokens": _np(sd, "decoder.embed_tokens.weight"),
        "embed_positions": _np(sd, "decoder.embed_positions.weight"),
        "layer_norm": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        r = f"decoder.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _attn_params(sd, f"{r}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{r}.self_attn_layer_norm"),
            "encoder_attn": _attn_params(sd, f"{r}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, f"{r}.encoder_attn_layer_norm"),
            "fc1": {"kernel": _np(sd, f"{r}.fc1.weight").T,
                    "bias": _np(sd, f"{r}.fc1.bias")},
            "fc2": {"kernel": _np(sd, f"{r}.fc2.weight").T,
                    "bias": _np(sd, f"{r}.fc2.bias")},
            "final_layer_norm": _ln(sd, f"{r}.final_layer_norm"),
        }
    return p
