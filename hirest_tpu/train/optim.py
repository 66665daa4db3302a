"""Optimizer and LR schedule.

Parity with the reference: AdamW at a flat base lr with a linear
warmup-then-linear-decay schedule (trainer_base.py:33-67, which uses
transformers.get_linear_schedule_with_warmup), with optional global-norm
gradient clipping applied BEFORE the optimizer step (run.py:265-272) and
gradient accumulation (run.py:274-295).
"""

from __future__ import annotations

import optax


def linear_warmup_schedule(base_lr: float, warmup_steps: int, total_steps: int):
    """lr(step) = base * step/warmup for step < warmup, then linear decay to 0
    over the remaining steps — the exact transformers formula."""

    def schedule(step):
        step = step.astype(float) if hasattr(step, "astype") else float(step)
        warm = step / max(1.0, float(warmup_steps))
        decay = (total_steps - step) / max(1.0, float(total_steps - warmup_steps))
        import jax.numpy as jnp

        return base_lr * jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return schedule


def make_optimizer(lr: float, warmup_steps: float, total_steps: int,
                   clip_grad_norm: float = -1.0, weight_decay: float = 0.01,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """Build the optax chain. `warmup_steps` < 1 is a ratio of total steps
    (args.py:35 semantics via trainer_base.py:43-48).

    weight_decay default 0.01: the reference parses --weight_decay
    (args.py:34, default 0.0) but never passes it to the optimizer —
    trainer_base.py:56-59 builds torch.optim.AdamW(parameters, lr=...)
    whose own default is 0.01, so 0.01 is what reference training actually
    runs with. Here the flag is live (an explicit value is honored) but
    the default matches the reference's effective behavior."""
    if warmup_steps < 1:
        warmup = int(total_steps * warmup_steps)
    else:
        warmup = int(warmup_steps)

    schedule = linear_warmup_schedule(lr, warmup, total_steps)
    parts = []
    if clip_grad_norm and clip_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    parts.append(optax.adamw(schedule, weight_decay=weight_decay))
    tx = optax.chain(*parts)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


# ---------------------------------------------------------------------------
# BertAdam — the CLIP4Caption pretrain optimizer
# ---------------------------------------------------------------------------


def _bert_schedule(name: str):
    import jax.numpy as jnp

    def warmup_cosine(x, warmup):
        return jnp.where(x < warmup, x / warmup,
                         0.5 * (1.0 + jnp.cos(jnp.pi * x)))

    def warmup_constant(x, warmup):
        return jnp.where(x < warmup, x / warmup, 1.0)

    def warmup_linear(x, warmup):
        return jnp.where(x < warmup, x / warmup,
                         jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))

    return {"warmup_cosine": warmup_cosine,
            "warmup_constant": warmup_constant,
            "warmup_linear": warmup_linear}[name]


def bert_adam(lr: float, warmup: float = -1.0, t_total: int = -1,
              schedule: str = "warmup_linear", b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-6,
              weight_decay: float = 0.01,
              max_grad_norm: float = 1.0,
              decay_mask=None) -> optax.GradientTransformation:
    """Exact BertAdam semantics (reference
    clip4caption/modules/optimization.py:52-167), as one optax transform:

    - Adam moments WITHOUT bias correction;
    - PER-PARAMETER gradient-norm clipping (torch clip_grad_norm_ on each
      tensor individually, optimization.py:135-136) — not global-norm;
    - decoupled weight decay added to the update before lr scaling;
    - schedule evaluated at step/t_total with the step counter starting at
      0 (so the very first warmup_linear step has lr == 0).

    decay_mask: optional bool pytree (params structure); weight decay is
    applied only where True — the optax analogue of the reference's param
    groups, which give bias/LayerNorm tensors weight_decay 0.0
    (clip4caption/train.py:196-211). None decays everything (plain
    BertAdam(weight_decay=...) semantics).

    Used by the CLIP4Caption captioning pretrain loop
    (clip4caption/train.py uses BertAdam); HiREST's own trainer uses AdamW.
    """
    import jax
    import jax.numpy as jnp

    sched = _bert_schedule(schedule)

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"step": jnp.zeros((), jnp.int32),
                "m": zeros,
                "v": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        assert params is not None, "bert_adam needs params (weight decay)"

        def clip(g):
            if max_grad_norm <= 0:
                return g
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            coef = jnp.minimum(max_grad_norm / (norm + 1e-6), 1.0)
            return g * coef.astype(g.dtype)

        grads = jax.tree_util.tree_map(clip, grads)
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                                   state["m"], grads)
        v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                                   state["v"], grads)
        if t_total != -1:
            progress = state["step"].astype(jnp.float32) / t_total
            lr_t = lr * sched(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        def upd(m_, v_, p, decay):
            u = m_ / (jnp.sqrt(v_) + eps)
            if weight_decay > 0 and decay:
                u = u + weight_decay * p
            return -lr_t * u

        mask = (decay_mask if decay_mask is not None
                else jax.tree_util.tree_map(lambda _: True, params))
        updates = jax.tree_util.tree_map(upd, m, v, params, mask)
        return updates, {"step": state["step"] + 1, "m": m, "v": v}

    return optax.GradientTransformation(init, update)
