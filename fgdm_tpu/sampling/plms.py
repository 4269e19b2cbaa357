"""PLMS (pseudo-linear multistep) sampler as a lax.scan.

Mirrors `/root/reference/ldm/models/diffusion/plms.py:11-236`: order-4
Adams-Bashforth over the eps history with the reference's warm-start rules —
step 0 does a midpoint correction (extra model call at t_next), steps 1-2 use
the 2nd/3rd-order formulas, steps ≥3 the 4th-order one.  The history lives
in the scan carry as a fixed [3, ...] buffer; the order switch is a
``lax.switch`` over ``min(i, 3)`` so one compiled program serves all steps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DDIMSchedule
from fgdm_tpu.sampling.ddim import DenoiseFn, cfg_eps, ddim_step


def plms_sample(
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    sched: DDIMSchedule,
    cond: Any,
    uncond: Any = None,
    cfg_scale: float = 7.5,
    x_T: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if x_T is None:
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape, jnp.float32)
    else:
        # deterministic after x_T — rng may be None (per-slot chain path)
        x = x_T
    S = sched.num_steps
    b = shape[0]

    def model(x, index):
        t = jnp.full((b,), sched.timesteps[index], dtype=jnp.int32)
        return cfg_eps(denoise_fn, x, t, cond, uncond, cfg_scale)

    def body(carry, i):
        x, hist = carry                       # hist: [3, *shape] newest-first
        index = S - 1 - i
        e_t = model(x, index)

        def order1(_):
            # midpoint correction: step once, re-evaluate at t_next
            x_prev, _ = ddim_step(x, e_t, index, sched)
            idx_next = jnp.maximum(index - 1, 0)
            e_t_next = model(x_prev, idx_next)
            return (e_t + e_t_next) / 2.0

        def order2(_):
            return (3.0 * e_t - hist[0]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0

        def order4(_):
            return (
                55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]
            ) / 24.0

        order = jnp.minimum(i, 3)
        e_t_prime = jax.lax.switch(order, [order1, order2, order3, order4], None)
        x_prev, pred_x0 = ddim_step(x, e_t_prime, index, sched)
        new_hist = jnp.concatenate([e_t[None], hist[:2]], axis=0)
        return (x_prev, new_hist), ()

    hist0 = jnp.zeros((3,) + tuple(shape), jnp.float32)
    (x, _), _ = jax.lax.scan(body, (x, hist0), jnp.arange(S))
    return x, {}
