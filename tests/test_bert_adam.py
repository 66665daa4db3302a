"""BertAdam parity: our optax transform vs the reference torch optimizer
(clip4caption/modules/optimization.py) imported as an oracle."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/clip4caption")

from modules.optimization import BertAdam  # noqa: E402  (reference oracle)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from hirest_tpu.train.optim import bert_adam  # noqa: E402


def _run_pair(steps=5, lr=0.01, warmup=0.2, t_total=10,
              schedule="warmup_linear", weight_decay=0.01,
              max_grad_norm=1.0, seed=0):
    rng = np.random.default_rng(seed)
    shapes = [(4, 3), (7,), (2, 2, 2)]
    params0 = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads = [[rng.normal(size=s).astype(np.float32) * (3.0 if i == 0 else 0.3)
              for s in shapes] for i in range(steps)]

    # --- torch oracle ---------------------------------------------------
    tparams = [torch.nn.Parameter(torch.tensor(p.copy())) for p in params0]
    opt = BertAdam(tparams, lr=lr, warmup=warmup, t_total=t_total,
                   schedule=schedule, weight_decay=weight_decay,
                   max_grad_norm=max_grad_norm)
    for g in grads:
        for p, gi in zip(tparams, g):
            p.grad = torch.tensor(gi.copy())
        opt.step()
        opt.zero_grad()
    torch_out = [p.detach().numpy() for p in tparams]

    # --- ours -----------------------------------------------------------
    tx = bert_adam(lr, warmup=warmup, t_total=t_total, schedule=schedule,
                   weight_decay=weight_decay, max_grad_norm=max_grad_norm)
    jp = [jnp.asarray(p) for p in params0]
    state = tx.init(jp)
    for g in grads:
        updates, state = tx.update([jnp.asarray(x) for x in g], state, jp)
        jp = optax.apply_updates(jp, updates)
    jax_out = [np.asarray(p) for p in jp]
    return torch_out, jax_out


# warmup_cosine is excluded: the reference's own implementation crashes on
# its float input (torch.cos on a python float, optimization.py:29) — dead
# code upstream (clip4caption/train.py always uses warmup_linear).
@pytest.mark.parametrize("schedule", ["warmup_linear", "warmup_constant"])
def test_bert_adam_matches_reference(schedule):
    torch_out, jax_out = _run_pair(schedule=schedule)
    for t, j in zip(torch_out, jax_out):
        np.testing.assert_allclose(j, t, rtol=1e-5, atol=1e-6)


def test_warmup_cosine_formula():
    from hirest_tpu.train.optim import _bert_schedule

    f = _bert_schedule("warmup_cosine")
    assert float(f(jnp.asarray(0.1), 0.2)) == pytest.approx(0.5)
    assert float(f(jnp.asarray(0.5), 0.2)) == pytest.approx(
        0.5 * (1 + np.cos(np.pi * 0.5)))


def test_bert_adam_per_param_clipping_matters():
    """The big-gradient tensor (norm >> 1) must be clipped individually —
    global-norm clipping would scale the small tensors too."""
    torch_out, jax_out = _run_pair(max_grad_norm=1.0)
    for t, j in zip(torch_out, jax_out):
        np.testing.assert_allclose(j, t, rtol=1e-5, atol=1e-6)

    torch_nc, jax_nc = _run_pair(max_grad_norm=-1)
    assert not np.allclose(torch_nc[0], torch_out[0])  # clip changed the run
    for t, j in zip(torch_nc, jax_nc):
        np.testing.assert_allclose(j, t, rtol=1e-5, atol=1e-6)


def test_bert_adam_constant_lr_no_schedule():
    torch_out, jax_out = _run_pair(warmup=-1, t_total=-1)
    for t, j in zip(torch_out, jax_out):
        np.testing.assert_allclose(j, t, rtol=1e-5, atol=1e-6)


def test_decay_mask_excludes_bias_and_layernorm():
    """decay_mask=False leaves a parameter undecayed (the reference's param
    groups give bias/LayerNorm weight_decay 0.0, clip4caption/train.py:
    196-211); with zero grads the Adam term is 0, so only decayed params
    move."""
    params = {"dense": {"kernel": jnp.ones((3,)), "bias": jnp.ones((3,))},
              "LayerNorm": {"scale": jnp.ones((3,)), "bias": jnp.ones((3,))}}

    def decays(path):
        keys = [getattr(k, "key", str(k)) for k in path]
        return not (keys[-1] == "bias" or any("LayerNorm" in k for k in keys))

    mask = jax.tree_util.tree_map_with_path(lambda p, _: decays(p), params)
    tx = bert_adam(lr=1.0, weight_decay=0.01, max_grad_norm=-1.0,
                   decay_mask=mask)
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["dense"]["kernel"]), 1.0)
    assert np.allclose(np.asarray(new["dense"]["bias"]), 1.0)
    assert np.allclose(np.asarray(new["LayerNorm"]["scale"]), 1.0)
    assert np.allclose(np.asarray(new["LayerNorm"]["bias"]), 1.0)
