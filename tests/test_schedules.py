"""Golden-value tests: schedule buffers must match the torch reference math
(formulas from ldm/modules/diffusionmodules/util.py and ddpm.py, recomputed
here independently with torch float64 as the oracle)."""

import numpy as np
import pytest
import torch

from fgdm_tpu.core.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
)

SD_ARGS = dict(linear_start=0.00085, linear_end=0.0120)


def torch_linear_betas(n, start, end):
    return (
        torch.linspace(start**0.5, end**0.5, n, dtype=torch.float64) ** 2
    ).numpy()


def test_linear_betas_match_torch():
    ours = make_beta_schedule("linear", 1000, **SD_ARGS)
    ref = torch_linear_betas(1000, SD_ARGS["linear_start"], SD_ARGS["linear_end"])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_cosine_betas():
    ours = make_beta_schedule("cosine", 100)
    ts = torch.arange(101, dtype=torch.float64) / 100 + 8e-3
    alphas = torch.cos(ts / (1 + 8e-3) * np.pi / 2) ** 2
    alphas = alphas / alphas[0]
    ref = np.clip((1 - alphas[1:] / alphas[:-1]).numpy(), 0, 0.999)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_schedule_buffers():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    betas = torch_linear_betas(1000, SD_ARGS["linear_start"], SD_ARGS["linear_end"])
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - acp), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod_prev), np.append(1.0, acp[:-1]), rtol=1e-6
    )
    # eps-param lvlb weights finite and positive
    w = np.asarray(s.lvlb_weights)
    assert np.all(np.isfinite(w)) and np.all(w > 0)


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981  # 0..980 step 20, +1
    np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)


def test_ddim_tables_match_reference_formula():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    d = DDIMSchedule.create(s, 50, eta=0.0)
    acp = s._alphas_cumprod_np
    ts = make_ddim_timesteps("uniform", 50, 1000)
    np.testing.assert_allclose(np.asarray(d.alphas), acp[ts], rtol=1e-6)
    ref_prev = np.asarray([acp[0]] + acp[ts[:-1]].tolist())
    np.testing.assert_allclose(np.asarray(d.alphas_prev), ref_prev, rtol=1e-6)
    assert np.all(np.asarray(d.sigmas) == 0)


def test_ddim_eta_sigmas():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    d = DDIMSchedule.create(s, 50, eta=1.0)
    a, ap = np.asarray(d.alphas, np.float64), np.asarray(d.alphas_prev, np.float64)
    ref = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(d.sigmas), ref, rtol=1e-5)


def test_q_sample_reconstruction(rng):
    import jax
    import jax.numpy as jnp

    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    x0 = jax.random.normal(rng, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500])
    xt = s.q_sample(x0, t, noise)
    x0_rec = s.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_v_parameterization_roundtrip(rng):
    import jax
    import jax.numpy as jnp

    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    x0 = jax.random.normal(rng, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500])
    xt = s.q_sample(x0, t, noise)
    v = s.get_v(x0, noise, t)
    x0_rec = s.predict_start_from_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
