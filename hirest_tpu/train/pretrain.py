"""Caption-generator pretraining (the CLIP4Caption stage).

Reference surface: clip4caption/train.py:41-509 — the MSR-VTT-style
captioning pretrain loop that produces `clip4caption_vit-b-32_model.bin`,
plus dataloaders/dataloader_hodini_feats.py which retargets it at HiREST
step annotations. Here it's one loop over (video features, caption) pairs:

    features [T, D] --NormalizeVideo LN--> VisualEncoder --> DecoderModel
    teacher-forced CE (PAD positions included, parity with the reference
    CrossEntropyLoss(ignore_index=-1) + 0-padded targets)

The pretrained encoder/decoder subtrees drop directly into MomentModel
(same param layout), replacing the torch .bin initializer path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from hirest_tpu.config import DecoderConfig, VisualEncoderConfig
from hirest_tpu.models.caption import CaptionDecoder, VisualEncoder
from hirest_tpu.native import trim_to_moment
from hirest_tpu.train.losses import step_captioning_loss


class CaptionGenerator(nn.Module):
    """Standalone encoder+decoder captioner (reference
    clip4caption/modules/modeling.py:108-215): LayerNorm frontend
    (NormalizeVideo) -> BERT-style visual encoder -> tied-classifier decoder."""

    visual: VisualEncoderConfig = VisualEncoderConfig()
    decoder_cfg: DecoderConfig = DecoderConfig()
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    def setup(self):
        self.normalize_video = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)
        self.encoder = VisualEncoder(self.visual, dtype=self.dtype,
                                     deterministic=self.deterministic)
        self.decoder = CaptionDecoder(self.decoder_cfg, dtype=self.dtype,
                                      deterministic=self.deterministic)

    def encode(self, video_feats):
        return self.encoder(self.normalize_video(video_feats.astype(self.dtype)))

    def __call__(self, video_feats, input_ids, answer_mask=None):
        visual_output = self.encode(video_feats)
        return self.decoder(input_ids, visual_output, answer_mask=answer_mask)


def build_pretrain_examples(annotations: dict, store, tokenizer, max_words: int,
                            max_frames: int) -> list[dict]:
    """HiREST step annotations -> (trimmed features, caption targets) pairs
    (the dataloader_hodini_feats.py retargeting)."""
    from hirest_tpu.data.annotations import build_examples, caption_targets

    examples = build_examples(annotations, "step_captioning")
    out = []
    for e in examples:
        feats = store.visual(e["fname"], e["n_model_frames"])
        # reconcile mask vs actual feature length BOTH ways: truncate a
        # longer mask, and zero-pad a shorter one (feature files routinely
        # have a few more rows than int(v_duration); the extra frames are
        # outside the annotated moment either way)
        mm = np.asarray(e["moment_mask"])[: feats.shape[0]]
        if mm.shape[0] < feats.shape[0]:
            mm = np.pad(mm, (0, feats.shape[0] - mm.shape[0]))
        if mm.sum() == 0:
            continue
        d = caption_targets(tokenizer, e["target_text_raw"], max_words)
        d["vis_feats"] = trim_to_moment(feats, mm, max_frames)
        d["caption"] = e["target_text_raw"]
        out.append(d)
    return out


def pretrain_caption_generator(
    examples: list[dict],
    visual_cfg: VisualEncoderConfig = VisualEncoderConfig(),
    decoder_cfg: DecoderConfig = DecoderConfig(),
    batch_size: int = 32,
    epochs: int = 5,
    lr: float = 1e-4,
    warmup: float = 0.1,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Train the captioner; returns (model, params). params['params'] has
    'encoder' and 'decoder' subtrees compatible with MomentModel."""
    model = CaptionGenerator(visual_cfg, decoder_cfg)
    feats0 = jnp.asarray(examples[0]["vis_feats"][None])
    ids0 = jnp.asarray(examples[0]["input_caption_ids"][None])
    params = model.init(jax.random.PRNGKey(seed), feats0, ids0)

    steps_per_epoch = max(1, len(examples) // batch_size)
    # BertAdam with warmup_linear — the exact optimizer of the upstream
    # captioning pretrain (clip4caption/train.py uses modules/optimization
    # BertAdam; per-parameter grad clipping, no bias correction). Bias and
    # LayerNorm tensors are excluded from weight decay, mirroring the
    # reference's param groups (clip4caption/train.py:196-211: no_decay =
    # ['bias', 'LayerNorm.bias', 'LayerNorm.weight'] -> weight_decay 0.0).
    from hirest_tpu.train.optim import bert_adam

    def _decays(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        return not (keys[-1] == "bias"
                    or any("LayerNorm" in k for k in keys))

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: _decays(path), params)
    tx = bert_adam(lr, warmup=warmup, t_total=steps_per_epoch * epochs,
                   schedule="warmup_linear", max_grad_norm=1.0,
                   decay_mask=decay_mask)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, feats, in_ids, out_ids, dec_mask):
        def loss_fn(p):
            logits = model.apply(p, feats, in_ids, dec_mask)
            return step_captioning_loss(logits, out_ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(len(examples))
        total, count = 0.0, 0
        for i in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [examples[j] for j in order[i: i + batch_size]]
            feats = jnp.asarray(np.stack([c["vis_feats"] for c in chunk]))
            in_ids = jnp.asarray(np.stack([c["input_caption_ids"] for c in chunk]))
            out_ids = jnp.asarray(np.stack([c["output_caption_ids"] for c in chunk]))
            dmask = jnp.asarray(np.stack([c["decoder_mask"] for c in chunk]))
            params, opt_state, loss = train_step(params, opt_state, feats,
                                                 in_ids, out_ids, dmask)
            total += float(loss)
            count += 1
        if verbose:
            print(f"pretrain epoch {epoch}: loss {total / max(1, count):.4f}")

    if ckpt_dir:
        from flax import serialization

        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, "caption_pretrain.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(params))
        if verbose:
            print("Saved", path)
    return model, params


def init_moment_model_from_pretrain(moment_params: dict, pretrain_params: dict) -> dict:
    """Graft a pretrained CaptionGenerator's encoder/decoder (+ video LN)
    into a MomentModel param tree (the flax-native analogue of the
    .bin initializer path)."""
    p = dict(moment_params)
    src = pretrain_params["params"]
    p["encoder"] = src["encoder"]
    p["decoder"] = src["decoder"]
    p["normalize_video"] = src["normalize_video"]
    return p
