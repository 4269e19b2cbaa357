"""Winograd F(2×2,3×3) conv: parity with the direct convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.kernels.winograd import conv3x3_winograd, winograd_ok


def _ref(x, w, b):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.astype(jnp.float32)[None, None, None, :]


@pytest.mark.parametrize("h,w_len,c,co", [
    (16, 16, 64, 64),
    (8, 8, 128, 64),      # small even
    (15, 17, 64, 128),    # odd sizes exercise the crop path
    (32, 32, 320, 320),   # UNet hot shape
])
def test_winograd_matches_direct_f32(np_rng, h, w_len, c, co):
    x = jnp.asarray(np_rng.standard_normal((2, h, w_len, c)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.standard_normal((co,)), jnp.float32)
    assert winograd_ok(x.shape, w.shape)
    out = conv3x3_winograd(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def test_winograd_bf16_close(np_rng):
    """bf16 path: Winograd loses ~1 bit vs direct (known property) — bound
    the relative error, don't demand bit equality."""
    x = jnp.asarray(np_rng.standard_normal((2, 16, 16, 128)), jnp.bfloat16)
    w = jnp.asarray(np_rng.standard_normal((3, 3, 128, 128)) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((128,), jnp.bfloat16)
    out = np.asarray(conv3x3_winograd(x, w, b), np.float32)
    ref = np.asarray(_ref(x, w, b), np.float32)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.03


def test_winograd_gates():
    assert not winograd_ok((1, 8, 8, 32), (3, 3, 32, 32))    # too narrow
    assert not winograd_ok((1, 8, 8, 64), (1, 1, 64, 64))    # not 3x3
    assert winograd_ok((1, 64, 64, 320), (3, 3, 320, 320))


def test_winograd_dispatch_in_conv2d(np_rng, monkeypatch):
    """FGDM_WINOGRAD_CONV=1 routes Conv2d's 3×3 stride-1 convs through the
    Winograd path."""
    import fgdm_tpu.nn.layers as nl

    monkeypatch.setattr(nl, "_WINOGRAD_CONV", True)
    conv = nl.Conv2d(64, kernel_size=3, dtype=jnp.float32)
    x = jnp.asarray(np_rng.standard_normal((1, 12, 12, 64)), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    out = conv.apply(params, x)
    monkeypatch.setattr(nl, "_WINOGRAD_CONV", False)
    ref = conv.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_winograd_whole_chain_parity(np_rng, monkeypatch):
    """FGDM_WINOGRAD_CONV flipped on for the FULL tiny seg→image chain:
    outputs stay close to the direct-conv chain (de-risks enabling the
    flag on hardware where only throughput, not correctness, is in
    question)."""
    import fgdm_tpu.nn.layers as nl
    from fgdm_tpu.diffusion.control import ControlLDM
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.controlnet import ControlNet
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.sampling.chain import fgdm_chain

    kw = dict(model_channels=64, num_heads=4, context_dim=64,
              channel_mult=(1, 2), attention_resolutions=(1, 2),
              num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=64, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=49408, embed_dim=64, num_layers=1,
                           num_heads=4)
    ld = LatentDiffusion.create(UNetModel(**kw), vae, clip,
                                jax.random.PRNGKey(0), latent_size=8)
    cldm = ControlLDM.create_control(
        UNetModel(**kw, use_adapter=False), vae, clip, ControlNet(**kw),
        jax.random.PRNGKey(1), latent_size=8, control_scales=(1.0,) * 5)
    ids = jnp.zeros((1, 77), jnp.int32)
    args = (ld, cldm, jax.random.PRNGKey(7),
            ld.get_learned_conditioning(ids),
            ld.get_learned_conditioning(ids),
            cldm.get_learned_conditioning(ids),
            cldm.get_learned_conditioning(ids))
    kw2 = dict(cond_hw=(64, 64), image_hw=(64, 64), f1_steps=3, f2_steps=2)

    monkeypatch.setattr(nl, "_WINOGRAD_CONV", False)
    ref = jax.jit(lambda *a: fgdm_chain(*a, **kw2))(*args)
    monkeypatch.setattr(nl, "_WINOGRAD_CONV", True)
    got = jax.jit(lambda *a: fgdm_chain(*a, **kw2))(*args)
    monkeypatch.setattr(nl, "_WINOGRAD_CONV", False)

    # model_channels=64 puts the c>=64 gate on the hot path (ch_mult keeps
    # every ResBlock conv eligible); f32 transforms keep the drift tiny
    for k in ("condition", "image"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=5e-3, atol=5e-3)
    assert float(jnp.std(got["image"])) > 1e-4
