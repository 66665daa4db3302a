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
                   clip_grad_norm: float = -1.0, weight_decay: float = 0.0,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """Build the optax chain. `warmup_steps` < 1 is a ratio of total steps
    (args.py:35 semantics via trainer_base.py:43-48)."""
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
