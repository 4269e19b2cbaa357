"""Metrics writer, image logger, ancestral sampler, inpainting tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.sampling.ancestral import p_sample_loop
from fgdm_tpu.sampling.ddim import ddim_sample
from fgdm_tpu.train.metrics import (
    ImageLogger,
    MetricsWriter,
    denoise_row_grid,
    make_grid,
    to_uint8,
)
from fgdm_tpu.utils.profiling import StepTimer, device_memory_stats

SD_ARGS = dict(linear_start=0.00085, linear_end=0.0120)


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.log(0, {"loss": 1.5, "skipme": "str"}, prefix="train")
    w.log(1, {"loss": jnp.asarray(0.5)}, prefix="train")
    w.close()
    rows = [json.loads(l) for l in open(w.path)]
    assert rows[0]["train/loss"] == 1.5 and "train/skipme" not in rows[0]
    assert rows[1]["train/loss"] == 0.5


def test_make_grid_and_logger(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (6, 8, 8, 3))
    grid = make_grid(to_uint8(imgs), nrow=3)
    assert grid.dtype == np.uint8
    assert grid.shape[0] == 2 * 10 + 2 and grid.shape[1] == 3 * 10 + 2
    logger = ImageLogger(str(tmp_path), batch_frequency=5)
    assert logger.should_log(0) and logger.should_log(5)
    assert not logger.should_log(3)
    logger.log(5, {"inputs": imgs})
    assert os.path.exists(os.path.join(str(tmp_path), "images",
                                       "inputs_gs-000005.png"))


def test_denoise_row():
    x = np.random.default_rng(0).uniform(-1, 1, (3, 2, 8, 8, 3))
    g = denoise_row_grid(x)
    assert g.dtype == np.uint8


def test_ancestral_sampler_small_T():
    s = DiffusionSchedule.create(20, "linear", **SD_ARGS)

    def denoise(x, t, cond):
        return 0.1 * x

    out, inter = p_sample_loop(denoise, jax.random.PRNGKey(0), (1, 8, 8, 4),
                               s, log_every_t=5)
    assert out.shape == (1, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    assert inter["x_inter"].shape[0] == 4


def test_inpainting_mask_keeps_known_region():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    d = DDIMSchedule.create(s, 8)
    x0 = jnp.ones((1, 8, 8, 4)) * 0.5
    mask = jnp.zeros((1, 8, 8, 4)).at[:, :4].set(1.0)  # keep top half

    def denoise(x, t, cond):
        return jnp.zeros_like(x)

    out, _ = ddim_sample(denoise, jax.random.PRNGKey(0), x0.shape, d, None,
                         cfg_scale=1.0, mask=mask, x0=x0, schedule=s)
    # kept region ends near x0 (last step composites q_sample at t≈0)
    kept_err = float(jnp.mean(jnp.abs(out[:, :4] - 0.5)))
    free_err = float(jnp.mean(jnp.abs(out[:, 4:] - 0.5)))
    assert kept_err < 0.2
    assert free_err > kept_err


def test_step_timer_and_memstats():
    t = StepTimer()
    t.start()
    x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    dt = t.stop(x)
    assert dt > 0 and t.mean > 0
    stats = device_memory_stats()
    assert "bytes_in_use_mib" in stats


def test_log_images_reference_key_set():
    """log_images with every flag on must produce the reference's grid set
    (ddpm.py:1466-1599): inputs/reconstruction/conditioning/diffusion_row/
    samples/denoise_row/progressive_row/inpaint+outpaint+mask."""
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.train.metrics import log_images

    rng = jax.random.PRNGKey(0)
    unet = UNetModel(model_channels=32, num_heads=4, context_dim=64,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        resolution=16, z_channels=4, embed_dim=4,
                        dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=1,
                           num_heads=4)
    ld = LatentDiffusion.create(unet, vae, clip, rng, latent_size=8)
    nr = np.random.default_rng(0)
    batch = {
        "image": nr.standard_normal((2, 16, 16, 3)).astype(np.float32) * 0.1,
        "input_ids": nr.integers(0, 128, (2, 77)).astype(np.int32),
        "captions": ["a cat", "a dog"],
    }
    out = log_images(ld, batch, jax.random.PRNGKey(1), n=2, ddim_steps=4,
                     inpaint=True, plot_denoise_rows=True,
                     plot_progressive_rows=True, plot_diffusion_rows=True,
                     n_diffusion_steps=3)
    expect = {"inputs", "reconstruction", "conditioning", "diffusion_row",
              "samples", "denoise_row", "progressive_row",
              "samples_inpainting", "mask", "samples_outpainting"}
    assert expect <= set(out), sorted(expect - set(out))
    for k, v in out.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), k
    # row grids arrive pre-assembled (uint8 grid images)
    assert out["denoise_row"].ndim == 3
    assert out["diffusion_row"].ndim == 3
    # the ImageLogger must accept the full dict (grids + batches) unchanged
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        logger = ImageLogger(d, batch_frequency=1)
        logger.log(0, out)
        files = os.listdir(os.path.join(d, "images"))
        assert len(files) == len(out)
