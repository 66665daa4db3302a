"""Loss parity vs torch reference formulations."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hirest_tpu.train.losses import (  # noqa: E402
    moment_retrieval_loss,
    moment_segmentation_loss,
    step_captioning_loss,
)

RNG = np.random.default_rng(0)


def test_moment_retrieval_loss_parity():
    B, T = 3, 12
    sl = RNG.normal(size=(B, T)).astype(np.float32)
    el = RNG.normal(size=(B, T)).astype(np.float32)
    st = np.array([2, 5, 7])
    et = np.array([4, 9, 11])
    mm = np.ones((B, T), dtype=np.int32)
    mm[1, 8:] = 0  # partial moment mask

    # reference math (modeling.py:249-264)
    slt, elt = torch.tensor(sl), torch.tensor(el)
    _st = torch.zeros(B, T).scatter_(1, torch.tensor(st).unsqueeze(1), 1)
    _et = torch.zeros(B, T).scatter_(1, torch.tensor(et).unsqueeze(1), 1)
    mmt = torch.tensor(mm, dtype=torch.float32)
    sloss = (F.binary_cross_entropy_with_logits(slt, _st, reduction="none") * mmt).sum() / mmt.sum()
    eloss = (F.binary_cross_entropy_with_logits(elt, _et, reduction="none") * mmt).sum() / mmt.sum()
    want = ((sloss + eloss) / 2).item()

    got = float(moment_retrieval_loss(jnp.asarray(sl), jnp.asarray(el),
                                      jnp.asarray(st), jnp.asarray(et),
                                      jnp.asarray(mm)))
    assert got == pytest.approx(want, rel=1e-5)


def test_moment_segmentation_loss_parity():
    B, T = 3, 10
    logits = RNG.normal(size=(B, T)).astype(np.float32)
    target = np.array([2, 7, 4])
    mm = np.ones((B, T), dtype=np.int32)
    mm[0, :2] = 0

    lt = torch.tensor(logits).clone()
    lt[torch.tensor(mm) == 0] = -torch.finfo(lt.dtype).max
    want = F.cross_entropy(lt, torch.tensor(target)).item()

    got = float(moment_segmentation_loss(jnp.asarray(logits), jnp.asarray(target),
                                         jnp.asarray(mm)))
    assert got == pytest.approx(want, rel=1e-5)


def test_step_captioning_loss_parity():
    B, L, V = 2, 6, 20
    logits = RNG.normal(size=(B, L, V)).astype(np.float32)
    ids = RNG.integers(0, V, size=(B, L)).astype(np.int64)

    want = F.cross_entropy(torch.tensor(logits).view(-1, V),
                           torch.tensor(ids).view(-1), ignore_index=-1).item()
    got = float(step_captioning_loss(jnp.asarray(logits), jnp.asarray(ids)))
    assert got == pytest.approx(want, rel=1e-5)


def test_batch_mask_drops_padded_rows():
    B, T = 4, 8
    logits = RNG.normal(size=(B, T)).astype(np.float32)
    target = np.array([1, 2, 3, 4])
    mm = np.ones((B, T), dtype=np.int32)
    full = float(moment_segmentation_loss(jnp.asarray(logits[:2]),
                                          jnp.asarray(target[:2]),
                                          jnp.asarray(mm[:2])))
    padded = float(moment_segmentation_loss(jnp.asarray(logits),
                                            jnp.asarray(target), jnp.asarray(mm),
                                            jnp.asarray(np.array([1, 1, 0, 0]))))
    assert padded == pytest.approx(full, rel=1e-6)
