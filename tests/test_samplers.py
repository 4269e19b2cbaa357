"""PLMS and DPM-Solver++ sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.sampling.ddim import ddim_sample
from fgdm_tpu.sampling.dpm_solver import NoiseScheduleVP, dpm_solver_sample
from fgdm_tpu.sampling.plms import plms_sample

SD_ARGS = dict(linear_start=0.00085, linear_end=0.0120)


@pytest.fixture(scope="module")
def schedule():
    return DiffusionSchedule.create(1000, "linear", **SD_ARGS)


def linear_denoise(rate=0.1):
    def fn(x, t, cond):
        return rate * x

    return fn


def gaussian_score_denoise(schedule, continuous_t=False):
    """Exact eps for x0 ~ N(0, I): eps*(x_t, t) = sqrt(1 - a_t)·x_t."""

    def fn(x, t, cond):
        idx = jnp.clip(jnp.round(t), 0, 999).astype(jnp.int32) if continuous_t \
            else t.astype(jnp.int32)
        a = schedule.alphas_cumprod[idx].reshape(-1, 1, 1, 1)
        return jnp.sqrt(1 - a) * x

    return fn


def test_plms_runs_and_deterministic(schedule):
    d = DDIMSchedule.create(schedule, 10, eta=0.0)

    @jax.jit
    def run(rng):
        return plms_sample(linear_denoise(), rng, (2, 8, 8, 4), d, None,
                           cfg_scale=1.0)[0]

    a = run(jax.random.PRNGKey(0))
    b = run(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))


def test_plms_higher_order_accuracy(schedule):
    """With the exact Gaussian score, PLMS(20) must beat DDIM(20) by a wide
    margin against a 500-step DDIM reference (measured ~270×)."""
    den = gaussian_score_denoise(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    d_fine = DDIMSchedule.create(schedule, 500, eta=0.0)
    ref = ddim_sample(den, jax.random.PRNGKey(1), x_T.shape,
                      d_fine, None, cfg_scale=1.0, x_T=x_T)[0]
    d20 = DDIMSchedule.create(schedule, 20, eta=0.0)
    crude = ddim_sample(den, jax.random.PRNGKey(1), x_T.shape,
                        d20, None, cfg_scale=1.0, x_T=x_T)[0]
    plms = plms_sample(den, jax.random.PRNGKey(1), x_T.shape,
                       d20, None, cfg_scale=1.0, x_T=x_T)[0]
    err_plms = float(jnp.mean(jnp.abs(plms - ref)))
    err_ddim = float(jnp.mean(jnp.abs(crude - ref)))
    assert err_plms < 0.1 * err_ddim


def test_noise_schedule_vp_matches_discrete_grid(schedule):
    ns = NoiseScheduleVP(schedule.alphas_cumprod)
    # at grid point t=(i+1)/N, alpha must equal sqrt(alphas_cumprod[i])
    for i in [0, 499, 999]:
        t = (i + 1) / 1000
        np.testing.assert_allclose(
            float(ns.marginal_alpha(jnp.asarray(t))),
            float(jnp.sqrt(schedule.alphas_cumprod[i])),
            rtol=1e-5,
        )
    # model input time mapping (dpm_solver.py:278-287)
    np.testing.assert_allclose(
        float(ns.model_input_time(jnp.asarray(1.0))), 999.0, rtol=1e-6
    )


def test_dpm_solver_runs_and_converges(schedule):
    den = gaussian_score_denoise(schedule)
    den_c = gaussian_score_denoise(schedule, continuous_t=True)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    d_fine = DDIMSchedule.create(schedule, 500, eta=0.0)
    ref = ddim_sample(den, jax.random.PRNGKey(1), x_T.shape,
                      d_fine, None, cfg_scale=1.0, x_T=x_T)[0]
    d20 = DDIMSchedule.create(schedule, 20, eta=0.0)
    crude = ddim_sample(den, jax.random.PRNGKey(1), x_T.shape,
                        d20, None, cfg_scale=1.0, x_T=x_T)[0]

    @jax.jit
    def run(x_T):
        return dpm_solver_sample(den_c, jax.random.PRNGKey(2),
                                 x_T.shape, schedule, None, cfg_scale=1.0,
                                 steps=20, x_T=x_T)

    out = run(x_T)
    assert np.all(np.isfinite(np.asarray(out)))
    err = float(jnp.mean(jnp.abs(out - ref)))
    err_ddim = float(jnp.mean(jnp.abs(crude - ref)))
    assert err < 0.5 * err_ddim  # 2nd order beats 1st order (measured ~5x)


def test_dpm_solver_single_step(schedule):
    out = dpm_solver_sample(linear_denoise(), jax.random.PRNGKey(0),
                            (1, 4, 4, 4), schedule, None, cfg_scale=1.0,
                            steps=1)
    assert np.all(np.isfinite(np.asarray(out)))
