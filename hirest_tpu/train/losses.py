"""Task losses, parity with the reference training steps.

- moment retrieval: BCE-with-logits against scattered one-hot start/end
  targets, moment-masked, normalized by mask mass (modeling.py:249-264).
- moment segmentation: frame-classification CE with out-of-moment logits
  forced to -float32.max (modeling.py:339-345).
- step captioning: token CE over ALL max_words positions including the
  zero-padding — the reference uses CrossEntropyLoss(ignore_index=-1) with
  0-padded targets, so [PAD] positions DO contribute to the loss
  (clip4caption/modules/modeling.py:140, modeling.py:519-521). Preserved
  for optimization parity.

All losses take an optional `batch_mask` [B] so bucket-padded batch rows
drop out without changing the real rows' normalization... in fact, to keep
exact reference normalization they re-weight as if only real rows existed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_weight(batch_size, batch_mask):
    if batch_mask is None:
        return jnp.ones((batch_size,), dtype=jnp.float32)
    return batch_mask.astype(jnp.float32)


def moment_retrieval_loss(start_logits, end_logits, start_target, end_target,
                          moment_mask, batch_mask=None):
    b, t = start_logits.shape
    rows = _row_weight(b, batch_mask)[:, None]
    mask = moment_mask.astype(jnp.float32) * rows

    start_onehot = jax.nn.one_hot(start_target, t, dtype=jnp.float32)
    end_onehot = jax.nn.one_hot(end_target, t, dtype=jnp.float32)

    def bce(logits, target):
        # = max(x,0) - x*y + log(1 + exp(-|x|)) (stable BCE-with-logits)
        x = logits.astype(jnp.float32)
        return jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))

    denom = jnp.clip(mask.sum(), 1.0, None)
    start_loss = (bce(start_logits, start_onehot) * mask).sum() / denom
    end_loss = (bce(end_logits, end_onehot) * mask).sum() / denom
    return (start_loss + end_loss) / 2


def moment_segmentation_loss(seg_logits, target, moment_mask, batch_mask=None):
    x = jnp.where(moment_mask > 0, seg_logits.astype(jnp.float32),
                  -jnp.finfo(jnp.float32).max)
    logp = jax.nn.log_softmax(x, axis=-1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    rows = _row_weight(seg_logits.shape[0], batch_mask)
    return (nll * rows).sum() / jnp.clip(rows.sum(), 1.0, None)


def step_captioning_loss(decoder_logits, output_ids, batch_mask=None):
    """Mean CE over every (batch, position) cell — PAD positions included,
    matching the reference's ignore_index=-1 with 0-padded targets."""
    b, length, vocab = decoder_logits.shape
    logp = jax.nn.log_softmax(decoder_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, output_ids[..., None], axis=-1)[..., 0]  # [B, L]
    rows = _row_weight(b, batch_mask)[:, None]
    return (nll * rows).sum() / jnp.clip((rows * jnp.ones((1, length))).sum(), 1.0, None)
