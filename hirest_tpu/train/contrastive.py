"""Contrastive objectives for caption/retrieval pretraining.

Reference surface: clip4caption/modules/until_module.py:182-261 (CrossEn,
MILNCELoss, MaxMarginRankingLoss) — used by the CLIP4Caption pretraining
stage that produces the decoder initializer. Pure jnp re-implementations of
the published formulas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_en(sim_matrix: jnp.ndarray) -> jnp.ndarray:
    """Row-wise InfoNCE with the diagonal as positives (CrossEn)."""
    logpt = jax.nn.log_softmax(sim_matrix.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.diagonal(logpt))


def milnce(sim_matrix: jnp.ndarray, batch_size: int | None = None,
           n_pair: int = 1) -> jnp.ndarray:
    """MIL-NCE (Miech et al. 2020): positives are the block-diagonal pairs
    of an [B*n, B*n] similarity matrix; the loss marginalizes over the
    positive set before the softmax."""
    n = sim_matrix.shape[0]
    b = batch_size or n // n_pair
    labels = jnp.kron(jnp.eye(b), jnp.ones((n_pair, n_pair)))  # [n, n]
    s = sim_matrix.astype(jnp.float32)
    # concatenate row-wise and column-wise candidates like the standard impl
    logits = jnp.concatenate([s, s.T], axis=1)                 # [n, 2n]
    mask = jnp.concatenate([labels, jnp.eye(n)], axis=1)
    pos = jnp.where(mask > 0, logits, -jnp.inf)
    nominator = jax.nn.logsumexp(pos, axis=1)
    denominator = jax.nn.logsumexp(logits, axis=1)
    return jnp.mean(denominator - nominator)


def max_margin_ranking(sim_matrix: jnp.ndarray, margin: float = 0.1) -> jnp.ndarray:
    """Bidirectional max-margin ranking loss against the diagonal positives."""
    s = sim_matrix.astype(jnp.float32)
    d = jnp.diagonal(s)
    row = jnp.maximum(0.0, margin + s - d[:, None])
    col = jnp.maximum(0.0, margin + s - d[None, :])
    n = s.shape[0]
    off = 1.0 - jnp.eye(n)
    return (jnp.sum(row * off) + jnp.sum(col * off)) / jnp.maximum(1.0, 2 * n * (n - 1))
