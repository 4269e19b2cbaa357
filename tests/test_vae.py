"""VAE shape / roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.models.autoencoder import (
    AutoencoderKL,
    DiagonalGaussian,
    NpleAutoencoderKL,
)

TINY = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
            z_channels=4, embed_dim=4, dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKL(**TINY)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, jnp.zeros((1, 32, 32, 3)), sample_posterior=False)
    return vae, params


def test_encode_decode_shapes(tiny_vae):
    vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    post = vae.apply(params, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (2, 16, 16, 4)  # f = 2^(levels-1) = 2 here
    rec = vae.apply(params, post.mode(), method=AutoencoderKL.decode)
    assert rec.shape == (2, 32, 32, 3)


def test_diagonal_gaussian_kl_zero_for_standard_normal():
    mean = jnp.zeros((2, 4, 4, 4))
    moments = jnp.concatenate([mean, jnp.zeros_like(mean)], axis=-1)
    d = DiagonalGaussian.from_moments(moments)
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)
    assert d.mode().shape == (2, 4, 4, 4)


def test_posterior_sampling_stochastic(tiny_vae):
    vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    post = vae.apply(params, x, method=AutoencoderKL.encode)
    s1 = post.sample(jax.random.PRNGKey(2))
    s2 = post.sample(jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_nple_autoencoder_channel_chunking():
    vae = NpleAutoencoderKL(**TINY, nple=2)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, jnp.zeros((1, 32, 32, 3)), sample_posterior=False)
    xs = [jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3))]
    z = vae.apply(params, xs, method=NpleAutoencoderKL.encode_nple)
    assert z.shape == (1, 16, 16, 8)  # 2 × 4ch stacked
    outs = vae.apply(params, z, method=NpleAutoencoderKL.decode_nple)
    assert len(outs) == 2 and outs[0].shape == (1, 32, 32, 3)


def test_sd_vae_downsample_factor():
    """SD config (ch_mult 1,2,4,4) must give the f=8, 4-ch latent."""
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      sample_posterior=False)
    post = vae.apply(params, jnp.zeros((1, 64, 64, 3)),
                     method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 8, 8, 4)
