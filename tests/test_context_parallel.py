"""Context parallelism: H-sharded sampling/decode over the mesh matches the
single-device result (VERDICT r2 #4 — the product path for ring attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DDIMSchedule
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.parallel.context import (context_mesh,
                                       context_parallel_pipeline,
                                       decode_context_parallel,
                                       sample_context_parallel)
from fgdm_tpu.sampling.ddim import ddim_sample

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=1, num_heads=4)


@pytest.fixture(scope="module")
def tiny_ld():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = jax.random.PRNGKey(0)
    unet = UNetModel(**UNET_TINY)
    vae = AutoencoderKL(**VAE_TINY)
    clip = CLIPTextEncoder(**CLIP_TINY)
    return LatentDiffusion.create(unet, vae, clip, rng, latent_size=32)


def test_cp_sample_matches_single_device(tiny_ld):
    """Same rng, same weights: the context-parallel sample must equal the
    single-device sample (ring attention is exact; GSPMD handles the
    convs) up to f32 reduction-order noise."""
    mesh = context_mesh(8)
    ld_cp = context_parallel_pipeline(tiny_ld, mesh)
    assert ld_cp.unet_def.seq_axis == "seq"
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 64)) * 0.1
    uc = jnp.zeros((1, 77, 64))
    rng = jax.random.PRNGKey(7)

    out_cp = np.asarray(sample_context_parallel(
        ld_cp, mesh, rng, ctx, uc, (256, 256), num_steps=3, cfg_scale=3.0))

    # single-device reference with the identical rng plumbing
    rng2, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, (1, 32, 32, 4), jnp.float32)
    sched = DDIMSchedule.create(tiny_ld.schedule, 3)
    z, _ = ddim_sample(tiny_ld.denoise_fn(), rng2, (1, 32, 32, 4), sched,
                       {"c_crossattn": ctx}, {"c_crossattn": uc},
                       cfg_scale=3.0, x_T=x_T)
    ref = np.asarray(tiny_ld.decode_first_stage(z))

    assert out_cp.shape == ref.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(out_cp, ref, rtol=1e-4, atol=1e-4)


def test_cp_decode_matches_single_device(tiny_ld):
    mesh = context_mesh(8)
    ld_cp = context_parallel_pipeline(tiny_ld, mesh)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 4))
    ref = np.asarray(tiny_ld.decode_first_stage(z))
    out = np.asarray(decode_context_parallel(ld_cp, mesh, z))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_cp_indivisible_height_fails(tiny_ld):
    mesh = context_mesh(8)
    ld_cp = context_parallel_pipeline(tiny_ld, mesh)
    ctx = jnp.zeros((1, 77, 64))
    with pytest.raises(AssertionError, match="divide"):
        sample_context_parallel(ld_cp, mesh, jax.random.PRNGKey(0), ctx, ctx,
                                (136, 136), num_steps=1)


def test_cp_uneven_deep_levels_warns_but_matches(tiny_ld):
    """H divisible by the mesh but not at every UNet level (the 1152²-on-8
    class of geometries): a layout-quality warning, not an error — and the
    sample still matches single-device."""
    import warnings as _w

    mesh = context_mesh(8)
    ld_cp = context_parallel_pipeline(tiny_ld, mesh)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64)) * 0.1
    uc = jnp.zeros((1, 77, 64))
    rng = jax.random.PRNGKey(5)

    # tiny UNet max_ds=2 ⇒ 192² image → latent H 24: 24 % 8 == 0 but
    # 24 % 16 != 0; token counts stay divisible (576, 144)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out_cp = np.asarray(sample_context_parallel(
            ld_cp, mesh, rng, ctx, uc, (192, 192), num_steps=2,
            cfg_scale=3.0, decode=False))
    assert any("thrash-free" in str(r.message) for r in rec)

    rng2, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, (1, 24, 24, 4), jnp.float32)
    sched = DDIMSchedule.create(tiny_ld.schedule, 2)
    ref, _ = ddim_sample(tiny_ld.denoise_fn(), rng2, (1, 24, 24, 4), sched,
                         {"c_crossattn": ctx}, {"c_crossattn": uc},
                         cfg_scale=3.0, x_T=x_T)
    np.testing.assert_allclose(out_cp, np.asarray(ref), rtol=1e-4, atol=1e-4)
