"""LR schedules: linear warmup + polynomial or cosine decay.

Matches transformers' get_polynomial_decay_schedule_with_warmup /
get_cosine_schedule_with_warmup, which the reference steps per optimizer
step (reference: src/vilt/modules/vilt_utils.py:339-354).
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_with_warmup(base_lr: float, warmup_steps: int, max_steps: int,
                           end_lr: float = 0.0, power: float = 1.0):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay_total = jnp.maximum(max_steps - warmup_steps, 1)
        remaining = 1.0 - (step - warmup_steps) / decay_total
        decayed = ((base_lr - end_lr) * remaining ** power + end_lr) / base_lr
        frac = jnp.where(step < warmup_steps, warm,
                         jnp.where(step > max_steps, end_lr / base_lr, decayed))
        return base_lr * frac
    return fn


def cosine_with_warmup(base_lr: float, warmup_steps: int, max_steps: int,
                       num_cycles: float = 0.5):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(
            max_steps - warmup_steps, 1)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)
    return fn


def resolve_warmup_steps(warmup_steps, max_steps: int) -> int:
    """float warmup = fraction of max_steps (vilt_utils.py:332-334)."""
    if isinstance(warmup_steps, float):
        return int(max_steps * warmup_steps)
    return int(warmup_steps)


def make_schedule(cfg: dict, max_steps: int):
    warmup = resolve_warmup_steps(cfg["warmup_steps"], max_steps)
    if cfg["decay_power"] == "cosine":
        return cosine_with_warmup(cfg["learning_rate"], warmup, max_steps)
    return polynomial_with_warmup(
        cfg["learning_rate"], warmup, max_steps,
        end_lr=cfg["end_lr"], power=float(cfg["decay_power"]))
