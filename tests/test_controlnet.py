"""ControlNet branch + ControlLDM + fused chain tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet, guess_mode_scales
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling import chain

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)
CN_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
               channel_mult=(1, 2), attention_resolutions=(1, 2),
               num_res_blocks=1, dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=2, num_heads=4)


@pytest.fixture(scope="module")
def tiny_controlnet():
    cn = ControlNet(**CN_TINY)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    hint = jnp.zeros((1, 128, 128, 3))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    params = cn.init(rng, x, hint, t, ctx)
    return cn, params


def test_controlnet_residual_count_and_shapes(tiny_controlnet):
    cn, params = tiny_controlnet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    hint = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3))
    outs = cn.apply(params, x, hint, jnp.array([5]), jnp.zeros((1, 77, 64)))
    # tiny: conv + 2 res + 1 down = 4 taps + middle = 5
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[-1].shape[-1] == 64  # middle at top mult


def test_hoisted_hint_embedding_matches_per_step_path(tiny_controlnet):
    """encode_hint + c_hint_emb (the sampler's scan-hoisted path) must
    produce exactly the residuals of the per-forward c_concat path."""
    cn, params = tiny_controlnet
    rng = jax.random.PRNGKey(3)
    # zero-init taps make every residual 0 — randomize to compare real work
    params = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape,
                                    a.dtype) * 0.02, params)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 128, 128, 3))
    t = jnp.array([5, 9])
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 77, 64))
    ref = cn.apply(params, x, hint, t, ctx)
    emb = cn.apply(params, None, hint, None, None, hint_only=True)
    assert emb.shape == (2, 16, 16, 32)
    hoisted = cn.apply(params, x, None, t, ctx, hint_emb=emb)
    for a, b in zip(ref, hoisted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero_convs_give_zero_residuals_at_init(tiny_controlnet):
    """Freshly initialized ControlNet must not perturb the UNet — all taps
    are zero-init 1×1 convs (cldm.py:789-790)."""
    cn, params = tiny_controlnet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    hint = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3))
    outs = cn.apply(params, x, hint, jnp.array([5]), jnp.zeros((1, 77, 64)))
    for o in outs:
        np.testing.assert_array_equal(np.asarray(o), 0.0)


def test_unet_consumes_control_residuals():
    unet = UNetModel(**UNET_TINY, use_adapter=False)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    params = unet.init(rng, x, t, ctx)
    # randomize the zero-init output conv so differences are visible
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    control = [
        jnp.ones((1, 16, 16, 32)),  # conv tap
        jnp.ones((1, 16, 16, 32)),  # level0 res
        jnp.ones((1, 8, 8, 32)),    # downsample tap
        jnp.ones((1, 8, 8, 64)),    # level1 res
        jnp.ones((1, 8, 8, 64)),    # middle
    ]
    xr = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    base = unet.apply(params, xr, t, ctx)
    with_ctrl = unet.apply(params, xr, t, ctx, control=control)
    assert not np.allclose(np.asarray(base), np.asarray(with_ctrl))
    mid_only = unet.apply(params, xr, t, ctx, control=control,
                          only_mid_control=True)
    assert not np.allclose(np.asarray(with_ctrl), np.asarray(mid_only))


def test_guess_mode_scales():
    s = guess_mode_scales(1.0)
    assert len(s) == 13
    np.testing.assert_allclose(s[12], 1.0)
    np.testing.assert_allclose(s[0], 0.825**12, rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_pipeline():
    rng = jax.random.PRNGKey(0)
    unet = UNetModel(**UNET_TINY)
    cn_unet = UNetModel(**UNET_TINY, use_adapter=False)
    vae = AutoencoderKL(**VAE_TINY)
    clip = CLIPTextEncoder(**CLIP_TINY)
    ld = LatentDiffusion.create(unet, vae, clip, rng, latent_size=8)
    cldm = ControlLDM.create_control(
        cn_unet, vae, clip, ControlNet(**CN_TINY), jax.random.PRNGKey(1),
        latent_size=8, control_scales=(1.0,) * 5,
    )
    return ld, cldm


def test_chain_end_to_end(tiny_pipeline):
    """Full text→condition→image chain runs as one jitted program."""
    ld, cldm = tiny_pipeline
    ctx = jnp.zeros((1, 77, 64))

    @jax.jit
    def run(rng):
        return chain.fgdm_chain(
            ld, cldm, rng, ctx, ctx, ctx, ctx,
            cond_hw=(64, 64), image_hw=(64, 64),
            f1_steps=2, f2_steps=2,
        )

    out = run(jax.random.PRNGKey(3))
    assert out["condition"].shape == (1, 64, 64, 3)
    assert out["hint"].shape == (1, 64, 64, 3)
    assert out["image"].shape == (1, 64, 64, 3)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_guess_mode_uncond_has_no_control(tiny_pipeline):
    """Guess mode (initialize_cn.py:86-91): the uncond branch runs with NO
    ControlNet residuals (c_concat=None), not a zero hint, and the decayed
    control_scales apply.  Verified against an explicit two-forward CFG."""
    _, cldm = tiny_pipeline
    # randomize the zero-init taps so control actually perturbs the UNet
    rng = np.random.default_rng(0)
    cp = jax.tree.map(
        lambda p: jnp.asarray(
            rng.standard_normal(p.shape).astype(np.float32) * 0.02),
        cldm.control_params)
    # ...and the UNet's zero-init output head, so eps ≠ 0
    up = jax.tree.map(
        lambda p: p + jnp.asarray(
            rng.standard_normal(p.shape).astype(np.float32) * 0.02),
        cldm.unet_params)
    cldm = cldm.replace(control_params=cp, unet_params=up)
    hint = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 77, 64)), jnp.float32)
    nctx = jnp.zeros((1, 77, 64))

    z = chain.sample_image_factor(
        cldm, jax.random.PRNGKey(5), hint, ctx, nctx,
        num_steps=2, cfg_scale=3.0, guess_mode=True)
    assert np.all(np.isfinite(np.asarray(z)))

    # explicit reference semantics: decayed scales, uncond without control
    gscales = guess_mode_scales(1.0, num=len(cldm.control_scales))
    cldm_g = cldm.replace(control_scales=gscales)
    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.sampling.ddim import ddim_sample

    sched = DDIMSchedule.create(cldm.schedule, 2)

    def fn(x, t, cond_d):
        e_c = cldm_g.apply_model(x, t, cond_d)
        e_uc = cldm_g.apply_model(x, t, {"c_crossattn": nctx})
        return e_uc + 3.0 * (e_c - e_uc)

    want, _ = ddim_sample(
        fn, jax.random.PRNGKey(5), z.shape, sched,
        cond={"c_crossattn": ctx, "c_concat": hint}, uncond=None,
        cfg_scale=1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(want), atol=1e-5)

    # and it must differ from the old zero-hint-uncond behaviour
    zero_hint_uncond, _ = ddim_sample(
        cldm_g.denoise_fn(), jax.random.PRNGKey(5), z.shape, sched,
        cond={"c_crossattn": ctx, "c_concat": hint},
        uncond={"c_crossattn": nctx, "c_concat": jnp.zeros_like(hint)},
        cfg_scale=3.0)
    assert not np.allclose(np.asarray(z), np.asarray(zero_hint_uncond),
                           atol=1e-5)


def test_chain_factor_sampler_choice(tiny_pipeline):
    """The chain factors accept the reference's --plms/--dpm sampler
    choices (scripts/txt2img.py:329-335); per-slot invariance holds for
    the deterministic samplers via the derived start noise."""
    from fgdm_tpu.sampling.chain import sample_condition_factor
    from fgdm_tpu.serving import slot_keys_from_seeds

    ld, _cldm = tiny_pipeline
    # zero-init head conv → eps ≡ 0 → every sampler degenerates to the
    # same noise scaling; randomize so the update rules actually differ
    rng0 = np.random.default_rng(3)
    ld = ld.replace(unet_params=jax.tree.map(
        lambda p: p + jnp.asarray(
            rng0.standard_normal(p.shape).astype(np.float32) * 0.02),
        ld.unet_params))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 64))
    uctx = jnp.zeros((2, 77, 64))
    keys = slot_keys_from_seeds([0, 1])
    outs = {}
    for sampler in ("ddim", "plms", "dpm"):
        z = sample_condition_factor(
            ld, None, ctx, uctx, latent_hw=(8, 8), num_steps=4,
            slot_rngs=keys, sampler=sampler)
        assert z.shape == (2, 8, 8, 4)
        assert np.all(np.isfinite(np.asarray(z)))
        outs[sampler] = np.asarray(z)
    # same start noise, different update rules → different trajectories
    assert not np.allclose(outs["ddim"], outs["plms"])
    assert not np.allclose(outs["ddim"], outs["dpm"])
    # slot invariance: slot 0 solo == slot 0 in the batch of two
    z_solo = sample_condition_factor(
        ld, None, ctx[:1], uctx[:1], latent_hw=(8, 8), num_steps=4,
        slot_rngs=keys[:1], sampler="dpm")
    # batch-1 and batch-2 programs fuse differently; identical math up to
    # f32 reduction order
    np.testing.assert_allclose(np.asarray(z_solo)[0], outs["dpm"][0],
                               rtol=2e-3, atol=1e-3)
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_condition_factor(ld, None, ctx, uctx, latent_hw=(8, 8),
                                num_steps=4, slot_rngs=keys, sampler="euler")

    # the image factor takes the same choice; guess mode stays DDIM
    from fgdm_tpu.sampling.chain import sample_image_factor

    hint = jax.random.uniform(jax.random.PRNGKey(8), (2, 64, 64, 3))
    z_img = sample_image_factor(_cldm, None, hint, ctx, uctx, num_steps=3,
                                slot_rngs=keys, sampler="dpm")
    assert z_img.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(z_img)))
    with pytest.raises(ValueError, match="guess mode"):
        sample_image_factor(_cldm, None, hint, ctx, uctx, num_steps=3,
                            slot_rngs=keys, sampler="dpm", guess_mode=True)


def test_chain_n_three_factors(tiny_pipeline):
    """BASELINE config #3: text→seg→depth→normal→image as ONE jitted call;
    each factor adapter-prompted by the previous factor's latent."""
    ld, cldm = tiny_pipeline
    # three condition factors sharing the tiny architecture (separate
    # checkpoints in production); randomize so factors differ
    rng0 = np.random.default_rng(0)
    factors = []
    for k in range(3):
        perturb = lambda p: p + jnp.asarray(
            rng0.standard_normal(p.shape).astype(np.float32) * 0.02)
        factors.append(ld.replace(
            unet_params=jax.tree.map(perturb, ld.unet_params)))
    ctx = jnp.zeros((1, 77, 64))

    @jax.jit
    def run(rng):
        return chain.fgdm_chain_n(
            factors, cldm, rng, [ctx, ctx, ctx], ctx,
            cn_prompt_ctx=ctx, cn_neg_ctx=ctx,
            cond_hw=(64, 64), image_hw=(64, 64),
            factor_steps=2, f2_steps=2,
        )

    out = run(jax.random.PRNGKey(3))
    assert len(out["conditions"]) == 3
    for c in out["conditions"]:
        assert c.shape == (1, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(c)))
    assert out["image"].shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out["image"])))

    # the chain really conditions on the previous factor: factor 2's output
    # changes when factor 1's params change (through pcond)
    factors_b = list(factors)
    rngb = np.random.default_rng(99)
    factors_b[0] = factors[0].replace(unet_params=jax.tree.map(
        lambda p: p + jnp.asarray(
            rngb.standard_normal(p.shape).astype(np.float32) * 0.1),
        factors[0].unet_params))

    @jax.jit
    def run_b(rng):
        return chain.fgdm_chain_n(
            factors_b, None, rng, [ctx, ctx, ctx], ctx,
            cond_hw=(64, 64), factor_steps=2,
        )

    out_b = run_b(jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(out["conditions"][1]),
                           np.asarray(out_b["conditions"][1]))


def test_chain_n_per_slot_rng(tiny_pipeline):
    """fgdm_chain_n(slot_rngs=...): slot results are invariant to batch
    composition across every factor and the ControlNet render."""
    ld, cldm = tiny_pipeline
    factors = [ld, ld]
    ctx2 = jnp.zeros((2, 77, 64))
    ctx1 = jnp.zeros((1, 77, 64))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2))

    @jax.jit
    def run2(keys):
        return chain.fgdm_chain_n(
            factors, cldm, None, [ctx2, ctx2], ctx2,
            cn_prompt_ctx=ctx2, cn_neg_ctx=ctx2,
            cond_hw=(64, 64), image_hw=(64, 64),
            factor_steps=2, f2_steps=2, slot_rngs=keys)

    @jax.jit
    def run1(keys):
        return chain.fgdm_chain_n(
            factors, cldm, None, [ctx1, ctx1], ctx1,
            cn_prompt_ctx=ctx1, cn_neg_ctx=ctx1,
            cond_hw=(64, 64), image_hw=(64, 64),
            factor_steps=2, f2_steps=2, slot_rngs=keys)

    out2 = run2(keys)
    # same executable, permuted slots → bit-exact permuted outputs
    perm = run2(keys[jnp.array([1, 0])])
    for c2, cp in zip(out2["conditions"], perm["conditions"]):
        np.testing.assert_array_equal(np.asarray(c2)[::-1], np.asarray(cp))
    np.testing.assert_array_equal(np.asarray(out2["image"])[::-1],
                                  np.asarray(perm["image"]))
    # a different batch shape is a different XLA executable — fusion choices
    # differ, so cross-shape agreement is to float precision, not bits
    out1 = run1(keys[1:])
    for c2, c1 in zip(out2["conditions"], out1["conditions"]):
        np.testing.assert_allclose(np.asarray(c2)[1], np.asarray(c1)[0],
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2["image"])[1],
                               np.asarray(out1["image"])[0], atol=1e-5)


def test_quantize_like_png():
    x = jnp.array([0.0, 0.5, 1.0, 1.5, -0.2])
    q = chain.quantize_like_png(x)
    np.testing.assert_allclose(np.asarray(q), [0.0, 128 / 255, 1.0, 1.0, 0.0],
                               atol=1e-7)
