"""The joint multitask model: shared trunk + task heads (flax).

Parity target: reference modeling.py:18-632 (`MomentModel`). Differences by
design (TPU-first):
- The frozen EVA-CLIP towers are NOT submodules; they run as separate
  feature functions and the trunk consumes the pooled text feature
  [B, 1024] (the reference embeds the 1.1B-param tower inside the joint
  module only to call it under no_grad — modeling.py:115-129,240-242).
- Shapes are static: every input is padded to a frame bucket and masked;
  the per-sample `linspace` temporal embedding is computed vectorized from
  the mask instead of a Python loop over the batch (modeling.py:182-196).
- Dead reference code (`moment_conv`, `input_dropout`, kornia import;
  modeling.py:7,51,60-74) is intentionally not ported.

Trunk math (modeling.py:155-210), in order:
  video [B,T,1024] -> clip_g_map -> LayerNorm(normalize_video)
  text  [B,1024]   -> clip_g_map_text -> L2 normalize
  feats = video * text[:, None]          (query gating)
  += asr_enc_layer(asr)  [optional]
  += boundary_embed(boundary_mask)  [segmentation only]
  += temporal_embed(normalized time in [-1,1], 0 on padding)
  += mask_embed(moment_mask)
  -> VisualEncoder (full attention) -> [B, T, 768]
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from hirest_tpu.config import JointModelConfig
from hirest_tpu.models.caption import CaptionDecoder, VisualEncoder


class MomentModel(nn.Module):
    config: JointModelConfig = JointModelConfig()
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    def setup(self):
        cfg = self.config
        d = cfg.embed_dim
        if cfg.use_asr:
            self.asr_norm = nn.LayerNorm(epsilon=1e-5, name="asr_norm", dtype=self.dtype)
            self.asr_proj = nn.Dense(d, name="asr_proj", dtype=self.dtype)
        self.temporal_fc1 = nn.Dense(d, name="temporal_fc1", dtype=self.dtype)
        self.temporal_fc2 = nn.Dense(d, name="temporal_fc2", dtype=self.dtype)
        self.mask_embed = nn.Embed(2, d, name="mask_embed", dtype=self.dtype)
        self.boundary_embed = nn.Embed(2, d, name="boundary_embed", dtype=self.dtype)
        self.clip_g_map = nn.Dense(d, name="clip_g_map", dtype=self.dtype)
        self.clip_g_map_text = nn.Dense(d, name="clip_g_map_text", dtype=self.dtype)
        self.normalize_video = nn.LayerNorm(epsilon=1e-12, name="normalize_video",
                                            dtype=self.dtype)
        self.encoder = VisualEncoder(cfg.visual, dtype=self.dtype,
                                     deterministic=self.deterministic, name="encoder")
        self.decoder = CaptionDecoder(cfg.decoder, dtype=self.dtype,
                                      deterministic=self.deterministic, name="decoder")
        self.start_predictor = nn.Dense(1, name="start_predictor", dtype=self.dtype)
        self.end_predictor = nn.Dense(1, name="end_predictor", dtype=self.dtype)
        self.segment_predictor = nn.Dense(1, name="segment_predictor", dtype=self.dtype)

    # -- shared trunk ---------------------------------------------------

    def trunk(self, video_feats, text_feat, video_mask=None, moment_mask=None,
              asr_feats=None, boundary_mask=None):
        """video_feats [B,T,1024], text_feat [B,1024] -> [B,T,768]."""
        b, t, _ = video_feats.shape
        if video_mask is None:
            video_mask = jnp.ones((b, t), dtype=jnp.int32)
        if moment_mask is None:
            moment_mask = jnp.ones((b, t), dtype=jnp.int32)

        video = self.clip_g_map(video_feats.astype(self.dtype))
        video = self.normalize_video(video)

        text = self.clip_g_map_text(text_feat.astype(self.dtype))
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)

        feats = video * text[:, None, :]

        if self.config.use_asr and asr_feats is not None:
            feats = feats + self.asr_proj(self.asr_norm(asr_feats.astype(self.dtype)))

        if boundary_mask is not None:
            feats = feats + self.boundary_embed(boundary_mask)

        # Vectorized per-sample normalized time: position i of a sample with
        # n valid frames gets (i/(n-1) - 0.5) * 2, padding positions get 0
        # (reference modeling.py:182-196).
        n_frames = jnp.sum(video_mask, axis=-1)  # [B]
        idx = jnp.arange(t, dtype=jnp.float32)[None, :]
        denom = jnp.maximum(n_frames - 1, 1).astype(jnp.float32)[:, None]
        times = (idx / denom - 0.5) * 2.0
        times = jnp.where(video_mask.astype(bool), times, 0.0)
        temb = self.temporal_fc2(jnp.tanh(self.temporal_fc1(times[..., None].astype(self.dtype))))
        feats = feats + temb

        feats = feats + self.mask_embed(moment_mask)

        return self.encoder(feats)

    # -- task forwards --------------------------------------------------

    def moment_retrieval(self, video_feats, text_feat, video_mask=None,
                         moment_mask=None, asr_feats=None):
        feats = self.trunk(video_feats, text_feat, video_mask,
                           moment_mask=moment_mask, asr_feats=asr_feats)
        start_logits = self.start_predictor(feats).squeeze(-1).astype(jnp.float32)
        end_logits = self.end_predictor(feats).squeeze(-1).astype(jnp.float32)
        return {"start_logits": start_logits, "end_logits": end_logits}

    def moment_segmentation(self, video_feats, text_feat, video_mask,
                            moment_mask, asr_feats=None, boundary_mask=None):
        feats = self.trunk(video_feats, text_feat, video_mask,
                           moment_mask=moment_mask, asr_feats=asr_feats,
                           boundary_mask=boundary_mask)
        return self.segment_predictor(feats).squeeze(-1).astype(jnp.float32)

    def caption_encode(self, video_feats, text_feat, asr_feats=None):
        """Trunk over moment-trimmed features (all masks = 1, reference
        modeling.py:513-514): [B, max_frames, 1024] -> [B, max_frames, 768]."""
        b, t, _ = video_feats.shape
        ones = jnp.ones((b, t), dtype=jnp.int32)
        return self.trunk(video_feats, text_feat, video_mask=ones,
                          moment_mask=ones, asr_feats=asr_feats)

    def caption_logits(self, visual_output, input_caption_ids, decoder_mask=None):
        """Teacher-forced decoder scores [B, L, V] (modeling.py:516-517)."""
        return self.decoder(input_caption_ids, visual_output, answer_mask=decoder_mask)

    def init_all(self, video_feats, text_feat, caption_ids, asr_feats=None):
        """Exercise every parameterized path once so `model.init(...,
        method=MomentModel.init_all)` creates the full parameter tree."""
        b, t, _ = video_feats.shape
        ones = jnp.ones((b, t), dtype=jnp.int32)
        mr = self.moment_retrieval(video_feats, text_feat, ones, ones, asr_feats)
        seg = self.moment_segmentation(video_feats, text_feat, ones, ones,
                                       asr_feats=asr_feats, boundary_mask=ones)
        vis = self.caption_encode(video_feats, text_feat, asr_feats=asr_feats)
        logits = self.caption_logits(vis, caption_ids)
        return mr, seg, logits

    def __call__(self, video_feats, text_feat, video_mask=None, moment_mask=None,
                 asr_feats=None, boundary_mask=None):
        """Default apply = moment-retrieval forward."""
        return self.moment_retrieval(video_feats, text_feat, video_mask,
                                     moment_mask, asr_feats)
