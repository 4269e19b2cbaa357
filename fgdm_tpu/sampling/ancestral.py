"""Ancestral DDPM sampling (full-T p_sample_loop) as a lax.scan.

Mirrors the reference's pixel-space ``DDPM.p_sample_loop``
(`/root/reference/ldm/models/diffusion/ddpm.py:276-360` region): posterior
mean from the eps prediction with clipped x0, posterior log-variance noise,
no noise at t=0.  Used by the base DDPM model family and ``log_images``
progressive rows.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.sampling.ddim import DenoiseFn, cfg_eps


def p_sample_loop(
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    schedule: DiffusionSchedule,
    cond: Any = None,
    uncond: Any = None,
    cfg_scale: float = 1.0,
    clip_denoised: bool = True,
    x_T: Optional[jnp.ndarray] = None,
    log_every_t: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    T = schedule.num_timesteps
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32) if x_T is None else x_T
    step_rngs = jax.random.split(rng, T)

    def bshape(v):
        return v.reshape((-1,) + (1,) * (len(shape) - 1))

    def body(x, per_step):
        i, step_rng = per_step
        t_scalar = T - 1 - i
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        e_t = cfg_eps(denoise_fn, x, t, cond, uncond, cfg_scale)
        x0 = schedule.predict_start_from_noise(x, t, e_t)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            bshape(schedule.posterior_mean_coef1[t]) * x0
            + bshape(schedule.posterior_mean_coef2[t]) * x
        )
        log_var = bshape(schedule.posterior_log_variance_clipped[t])
        noise = jax.random.normal(step_rng, shape, jnp.float32)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        out = (x,) if log_every_t else ()
        return x, out

    x, outs = jax.lax.scan(body, x, (jnp.arange(T), step_rngs))
    inter = {}
    if log_every_t:
        inter["x_inter"] = outs[0][::log_every_t]
    return x, inter
