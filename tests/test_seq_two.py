"""Joint two-factor UNet tests (SeqTwoUNet + co-denoising sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.models.seq_two_unet import SeqTwoUNet, joint_denoise_fn
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling.ddim import ddim_sample

TINY = dict(model_channels=32, num_heads=4, context_dim=64,
            channel_mult=(1, 2), attention_resolutions=(1, 2),
            num_res_blocks=1, dtype=jnp.float32)


@pytest.fixture(scope="module")
def seq2():
    model = SeqTwoUNet(**TINY, factor_channels=4, mapped_channels=4)
    x = jnp.zeros((1, 16, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    return model, params


def test_joint_forward_shapes(seq2):
    model, params = seq2
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    t = jnp.array([100, 500])
    out = model.apply(params, x, t, jnp.zeros((2, 77, 64)))
    assert out.shape == (2, 16, 16, 8)


def test_cond_map_bypass(seq2):
    """Supplying a known condition map skips unet2 (cldm.py:285-291)."""
    model, params = seq2
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8))
    t = jnp.array([10])
    cmap = jnp.ones((1, 16, 16, 4))
    out = model.apply(params, x, t, jnp.zeros((1, 77, 64)), cond_map=cmap)
    # condition eps is zeroed in bypass mode
    np.testing.assert_array_equal(np.asarray(out[..., 4:]), 0.0)


def test_joint_codenoising_sampling(seq2):
    """Both factors co-denoise under the standard DDIM scan."""
    model, params = seq2
    s = DiffusionSchedule.create(1000, "linear", linear_start=0.00085,
                                 linear_end=0.0120)
    d = DDIMSchedule.create(s, 4)
    fn = joint_denoise_fn(model, params)
    out, _ = ddim_sample(fn, jax.random.PRNGKey(0), (1, 16, 16, 8), d,
                         {"c_crossattn": jnp.zeros((1, 77, 64))},
                         cfg_scale=1.0)
    assert out.shape == (1, 16, 16, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_multi_prompt_adapter():
    """AdaptUNetModel equivalent: extra adapters sum into the features."""
    unet = UNetModel(**TINY, num_prompts=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    extra = [jnp.ones((1, 16, 16, 4)), jnp.zeros((1, 16, 16, 4))]
    params = unet.init(jax.random.PRNGKey(1), x, t, ctx, extra_pconds=extra)
    assert "adapters_0" in params["params"] and "adapters_1" in params["params"]
    # randomize the zero-init convs so outputs are distinguishable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim >= 2 else p, params)
    out_with = unet.apply(params, x, t, ctx, extra_pconds=extra)
    out_without = unet.apply(params, x, t, ctx)
    assert not np.allclose(np.asarray(out_with), np.asarray(out_without))
