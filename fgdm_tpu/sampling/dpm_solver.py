"""DPM-Solver++ (2M, multistep) sampler as a lax.scan.

TPU re-design of the vendored solver `/root/reference/ldm/models/diffusion/
dpm_solver/dpm_solver.py` in the exact configuration the reference uses
(`dpm_solver/sampler.py:67-81`): discrete ``NoiseScheduleVP`` over the
model's alphas_cumprod, classifier-free-guided noise model, data prediction
(``predict_x0=True``), ``method='multistep', order=2, skip_type=
'time_uniform', lower_order_final=True``.

Numerics preserved:
* λ(t) = log α(t) − log σ(t) with log α linearly interpolated over the
  discrete grid ``t_i = (i+1)/N`` (dpm_solver.py:107-130).
* model input time ``(t − 1/N)·1000`` (dpm_solver.py:278-287).
* first-order (DPM-Solver++ 1) and second-order multistep updates
  (``multistep_dpm_solver_second_update``, predict_x0 + 'dpm_solver' type).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.sampling.ddim import DenoiseFn, cfg_eps


class NoiseScheduleVP:
    """Discrete VP schedule with continuous-time interpolation."""

    def __init__(self, alphas_cumprod: jnp.ndarray):
        self.total_N = int(alphas_cumprod.shape[0])
        if isinstance(alphas_cumprod, jax.core.Tracer):
            # schedule arrives traced when the whole pipeline is a jit
            # argument (chain/CLI paths); f32 log costs ~1e-7 rel here,
            # the concrete branch below keeps f64 for the parity oracles
            log_alphas = 0.5 * jnp.log(alphas_cumprod.astype(jnp.float32))
        else:
            # host float64 for the log table (jax default config has no x64)
            log_alphas = jnp.asarray(
                0.5 * np.log(np.asarray(alphas_cumprod, dtype=np.float64)),
                dtype=jnp.float32,
            )
        self.t_array = jnp.linspace(0.0, 1.0, self.total_N + 1)[1:]
        self.log_alpha_array = log_alphas
        self.T = 1.0

    def marginal_log_mean_coeff(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_a = self.marginal_log_mean_coeff(t)
        return log_a - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_a))

    def model_input_time(self, t):
        return (t - 1.0 / self.total_N) * 1000.0


def dpm_solver_sample(
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    schedule: DiffusionSchedule,
    cond: Any,
    uncond: Any = None,
    cfg_scale: float = 7.5,
    steps: int = 20,
    x_T: Optional[jnp.ndarray] = None,
    t_start: float = 1.0,
    t_end: Optional[float] = None,
) -> jnp.ndarray:
    """DPM-Solver++(2M) sampling with ``steps`` model evaluations."""
    ns = NoiseScheduleVP(schedule.alphas_cumprod)
    if t_end is None:
        t_end = 1.0 / ns.total_N
    b = shape[0]

    if x_T is None:
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape, jnp.float32)
    else:
        # deterministic after x_T — rng may be None (per-slot chain path)
        x = x_T

    # time_uniform grid, steps+1 points from T to eps
    ts = jnp.linspace(t_start, t_end, steps + 1)
    lambdas = ns.marginal_lambda(ts)
    alphas = ns.marginal_alpha(ts)
    sigmas = ns.marginal_std(ts)

    def x0_pred(x, i):
        """Data prediction via the guided noise model at grid point i."""
        t_cont = ts[i]
        t_in = jnp.full((b,), ns.model_input_time(t_cont), jnp.float32)
        eps = cfg_eps(denoise_fn, x, t_in, cond, uncond, cfg_scale)
        return (x - sigmas[i] * eps) / alphas[i]

    # step 0: first-order update from t_0 to t_1
    m0 = x0_pred(x, 0)
    h0 = lambdas[1] - lambdas[0]
    x = sigmas[1] / sigmas[0] * x - alphas[1] * jnp.expm1(-h0) * m0

    def body(carry, i):
        # i runs 1..steps-1; update from ts[i] to ts[i+1]
        x, m_prev, lam_prev_prev = carry
        m_cur = x0_pred(x, i)
        lam_prev = lambdas[i]
        lam_t = lambdas[i + 1]
        h_0 = lam_prev - lam_prev_prev
        h = lam_t - lam_prev
        r0 = h_0 / h
        D1_0 = (m_cur - m_prev) / r0
        phi = jnp.expm1(-h)
        use_first_order = i == steps - 1  # lower_order_final on the last step
        x_second = (
            sigmas[i + 1] / sigmas[i] * x
            - alphas[i + 1] * phi * m_cur
            - 0.5 * alphas[i + 1] * phi * D1_0
        )
        x_first = sigmas[i + 1] / sigmas[i] * x - alphas[i + 1] * phi * m_cur
        x_new = jnp.where(use_first_order, x_first, x_second)
        return (x_new, m_cur, lam_prev), ()

    if steps > 1:
        (x, _, _), _ = jax.lax.scan(
            body, (x, m0, lambdas[0]), jnp.arange(1, steps)
        )
    return x
