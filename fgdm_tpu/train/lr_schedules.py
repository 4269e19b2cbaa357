"""LR-multiplier schedules (optax-compatible callables).

Mirrors `/root/reference/ldm/lr_scheduler.py`: ``LambdaLinearScheduler``
(`:81-98`) — linear warmup f_start→f_max then linear decay toward f_min over
the cycle — and ``LambdaWarmUpCosineScheduler2`` (`:36-78`).  The shipped
configs use one cycle with warmup 10k, f_start 1e-5 → f_max 1 → f_min 1
(constant after warmup), `models/config.yaml:24-31`.

Also implements the reference's LR scaling rule
``lr = accumulate_grad_batches × n_devices × batch_size × base_lr``
(`main.py:712-732`).
"""

from __future__ import annotations

import jax.numpy as jnp


def lambda_linear(
    warm_up_steps: int = 10_000,
    f_start: float = 1e-5,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
):
    # reference configs write cycle_lengths: [10000000000000] — a Python int
    # that overflows int32 when traced as a jit operand; close over floats
    warm_up_steps = float(warm_up_steps)
    f_start, f_max, f_min = float(f_start), float(f_max), float(f_min)
    cycle_length = float(cycle_length)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) / warm_up_steps * step
        decay = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        return jnp.where(step < warm_up_steps, warm, decay)

    return schedule


def lambda_warmup_cosine(
    warm_up_steps: int,
    f_start: float,
    f_max: float,
    f_min: float,
    cycle_length: float,
):
    warm_up_steps = float(warm_up_steps)
    f_start, f_max, f_min = float(f_start), float(f_max), float(f_min)
    cycle_length = float(cycle_length)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) / warm_up_steps * step
        t = jnp.clip(
            (step - warm_up_steps) / (cycle_length - warm_up_steps), 0.0, 1.0
        )
        cos = f_min + 0.5 * (f_max - f_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def scaled_lr(
    base_lr: float,
    batch_size: int,
    n_devices: int = 1,
    accumulate_grad_batches: int = 1,
    scale_lr: bool = True,
) -> float:
    if not scale_lr:
        return base_lr
    return accumulate_grad_batches * n_devices * batch_size * base_lr
