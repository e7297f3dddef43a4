"""Learning-rate schedule: linear warmup -> cosine decay to min_lr.

Exact functional parity with the reference's ``get_lr``
(scripts/phase5_big_run.py:653-676), including the base-lr hold when
``total_steps`` is None and the min-lr clamp past the horizon. Provided both
as a Python float function (for logging / host code) and as a jnp version
usable inside a jitted step. Steps here are OPTIMIZER steps — fixing the
reference's documented micro-batch counting footgun
(docs/EXPERIMENTS.md:708-719 per SURVEY.md §7).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def get_lr(
    step: int,
    total_steps: Optional[int],
    warmup_steps: int,
    base_lr: float,
    min_lr: float,
) -> float:
    if warmup_steps > 0 and step < warmup_steps:
        return base_lr * (step + 1) / warmup_steps
    if total_steps is None:
        return base_lr
    if step >= total_steps:
        return min_lr
    frac = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
    cos = 0.5 * (1.0 + math.cos(math.pi * frac))
    return min_lr + cos * (base_lr - min_lr)


def get_lr_jnp(
    step: jnp.ndarray,
    total_steps: Optional[int],
    warmup_steps: int,
    base_lr: float,
    min_lr: float,
) -> jnp.ndarray:
    """Traceable twin of :func:`get_lr` (step may be a traced int32)."""
    step_f = step.astype(jnp.float32)
    warm = base_lr * (step_f + 1.0) / max(warmup_steps, 1)
    if total_steps is None:
        after = jnp.float32(base_lr)
    else:
        frac = (step_f - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(frac, 0.0, 1.0)))
        after = min_lr + cos * (base_lr - min_lr)
    if warmup_steps <= 0:
        return after
    return jnp.where(step < warmup_steps, warm, after)
