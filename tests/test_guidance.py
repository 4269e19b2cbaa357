"""Attention-alignment guidance tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling.guidance import (
    _active,
    _chunk_align_mse,
    _schedule,
    alignment_loss,
    guided_update,
)


def test_schedule_buckets():
    scale, iters = _schedule(jnp.asarray(0))
    assert float(scale) == 4.0 and int(iters) == 2
    scale, iters = _schedule(jnp.asarray(3))
    assert float(scale) == 4.0 and int(iters) == 6
    scale, iters = _schedule(jnp.asarray(7))
    assert float(scale) == 3.0 and int(iters) == 3
    scale, iters = _schedule(jnp.asarray(15))
    assert float(scale) == 3.0 and int(iters) == 2
    scale, iters = _schedule(jnp.asarray(40))
    assert float(scale) == 1.0 and int(iters) == 2


def test_active_steps():
    active = [int(i) for i in range(40) if bool(_active(jnp.asarray(i)))]
    assert active[:10] == list(range(10))
    assert 15 in active and 20 in active and 35 in active
    assert 12 not in active and 36 not in active and 37 not in active


def test_chunk_align_mse_zero_for_identical():
    m = jnp.ones((4, 8, 8))
    assert float(_chunk_align_mse(m, 2)) == 0.0
    m2 = m.at[2:].set(2.0)  # second chunk differs
    assert float(_chunk_align_mse(m2, 2)) > 0


def test_alignment_loss_zero_when_aligned():
    sa = {"a": jnp.ones((4, 256, 256))}
    ca = {"a": jnp.ones((4, 256, 77))}
    loss = alignment_loss(sa, ca, num=2, loss_scale=jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_guided_update_moves_x():
    kw = dict(model_channels=32, num_heads=4, context_dim=64,
              channel_mult=(1, 2), attention_resolutions=(1, 2),
              num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        resolution=32, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=64, embed_dim=64, num_layers=1,
                           num_heads=4)
    ld = LatentDiffusion.create(UNetModel(**kw), vae, clip,
                                jax.random.PRNGKey(0), latent_size=16,
                                init_first_stage=False)

    def apply_capture(x, t, cond):
        return ld.apply_model(x, t, cond, capture=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    cond = {"c_crossattn": jax.random.normal(jax.random.PRNGKey(2),
                                             (2, 77, 64))}

    @jax.jit
    def run(x, step):
        return guided_update(apply_capture, x, t, cond, step, num=2)

    out_active = run(x, jnp.asarray(3))
    assert out_active.shape == x.shape
    assert not np.allclose(np.asarray(out_active), np.asarray(x))
    # inactive step (e.g. 12) leaves x untouched
    out_idle = run(x, jnp.asarray(12))
    np.testing.assert_array_equal(np.asarray(out_idle), np.asarray(x))
