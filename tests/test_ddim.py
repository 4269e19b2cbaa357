"""DDIM sampler tests: scan loop, CFG math, determinism, img2img."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.sampling.ddim import (
    cfg_eps,
    ddim_decode,
    ddim_sample,
    ddim_step,
    stochastic_encode,
)

SD_ARGS = dict(linear_start=0.00085, linear_end=0.0120)


@pytest.fixture(scope="module")
def sched():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    return s, DDIMSchedule.create(s, 10, eta=0.0)


def test_cfg_math():
    """e = e_uc + s(e_c − e_uc) with a single batched call."""
    calls = []

    def denoise(x, t, cond):
        calls.append(x.shape[0])
        return x * cond["c_crossattn"].reshape(-1, 1, 1, 1)

    x = jnp.ones((2, 4, 4, 4))
    t = jnp.zeros((2,), jnp.int32)
    cond = {"c_crossattn": jnp.full((2,), 3.0)}
    uncond = {"c_crossattn": jnp.full((2,), 1.0)}
    e = cfg_eps(denoise, x, t, cond, uncond, scale=2.0)
    # e_uc = 1, e_c = 3 → 1 + 2*(3-1) = 5
    np.testing.assert_allclose(np.asarray(e), 5.0)
    assert calls == [4]  # one fused call, batch doubled


def test_ddim_step_zero_noise_identity(sched):
    """At eta=0 with e_t=0 the update is pure alpha rescaling."""
    s, d = sched
    x = jnp.ones((1, 4, 4, 4))
    e_t = jnp.zeros_like(x)
    x_prev, pred_x0 = ddim_step(x, e_t, jnp.array(5), d)
    a_t = float(d.alphas[5]); a_prev = float(d.alphas_prev[5])
    np.testing.assert_allclose(
        np.asarray(pred_x0), 1 / np.sqrt(a_t), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x_prev), np.sqrt(a_prev) / np.sqrt(a_t), rtol=1e-5
    )


def test_ddim_sample_deterministic_and_jittable(sched):
    s, d = sched

    def denoise(x, t, cond):
        return 0.1 * x + jnp.mean(cond["c_crossattn"]) * 0.0

    cond = {"c_crossattn": jnp.zeros((2, 77, 64))}

    @jax.jit
    def run(rng):
        return ddim_sample(denoise, rng, (2, 8, 8, 4), d, cond)[0]

    out1 = run(jax.random.PRNGKey(7))
    out2 = run(jax.random.PRNGKey(7))
    out3 = run(jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_x_T_injection(sched):
    """Supplying x_T makes sampling reproducible regardless of rng — the
    reference's noise-injection parity hook (ddim.py:126-129)."""
    s, d = sched

    def denoise(x, t, cond):
        return 0.05 * x

    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    a = ddim_sample(denoise, jax.random.PRNGKey(1), (1, 8, 8, 4), d, None,
                    cfg_scale=1.0, x_T=x_T)[0]
    b = ddim_sample(denoise, jax.random.PRNGKey(2), (1, 8, 8, 4), d, None,
                    cfg_scale=1.0, x_T=x_T)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_img2img_roundtrip(sched):
    s, d = sched
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t_idx = jnp.array([5])
    xt = stochastic_encode(s, d, x0, t_idx, noise)
    assert xt.shape == x0.shape

    def denoise(x, t, cond):
        return jnp.zeros_like(x)

    out = ddim_decode(denoise, xt, d, t_start=5, cond=None, cfg_scale=1.0)
    assert out.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_intermediates_logging(sched):
    s, d = sched

    def denoise(x, t, cond):
        return jnp.zeros_like(x)

    _, inter = ddim_sample(denoise, jax.random.PRNGKey(0), (1, 4, 4, 4), d,
                           None, cfg_scale=1.0, log_every_t=5)
    assert inter["x_inter"].shape[0] == 2  # 10 steps / every 5


def test_per_slot_rng_batch_invariance(sched):
    """slot_rngs: slot b's trajectory depends only on slot_rngs[b] —
    permuting/slicing the batch permutes/slices the outputs, including the
    eta>0 per-step noise and the inpainting mask draws."""
    s, _ = sched
    d = DDIMSchedule.create(s, 10, eta=1.0)  # exercise per-step noise too

    def denoise(x, t, cond):
        return 0.1 * x  # slot-local model

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(3))
    shape3 = (3, 4, 4, 2)
    x3, _ = ddim_sample(denoise, None, shape3, d, cond={}, slot_rngs=keys)
    # permuted keys → permuted outputs
    perm = jnp.array([2, 0, 1])
    xp, _ = ddim_sample(denoise, None, shape3, d, cond={},
                        slot_rngs=keys[perm])
    np.testing.assert_array_equal(np.asarray(x3)[perm], np.asarray(xp))
    # a smaller batch reproduces its slots exactly
    x1, _ = ddim_sample(denoise, None, (1,) + shape3[1:], d, cond={},
                        slot_rngs=keys[1:2])
    np.testing.assert_array_equal(np.asarray(x3)[1], np.asarray(x1)[0])

    # inpainting path: mask noise is also per-slot
    mask = jnp.zeros(shape3).at[:, :2].set(1.0)
    x0 = jnp.ones(shape3)
    xm3, _ = ddim_sample(denoise, None, shape3, d, cond={}, slot_rngs=keys,
                         mask=mask, x0=x0, schedule=s)
    xm1, _ = ddim_sample(denoise, None, (1,) + shape3[1:], d, cond={},
                         slot_rngs=keys[2:], mask=mask[2:], x0=x0[2:],
                         schedule=s)
    np.testing.assert_array_equal(np.asarray(xm3)[2], np.asarray(xm1)[0])
