"""Factor-graph chain orchestration — the FG-DM product pipeline, fused.

The reference bridges its two factor models through PNG files on the host
(`/root/reference/scripts/txt2img_fgdm_inference.py:244-292`): factor 1
(text→condition) samples 50 DDIM steps at 256², decodes, saves uint8 PNGs,
cv2-resizes to 512², and factor 2 (`controlnet/initialize_cn.py:74-102`)
reloads them as the ControlNet hint for a 20-step DDIM at 512².

Here the whole chain is **one traced program**: latents never leave the
device; the PNG hop becomes an in-graph uint8 quantization (kept for
behavioural fidelity — the hint the ControlNet sees is bit-identical in
distribution to the reference's reloaded PNG) and a bilinear resize.

Defaults mirror `run_inference.sh`: factor 1 — 50 steps, CFG 7.5, eta 0;
factor 2 — 20 steps, CFG 9.0, strength 1.0, positive suffix
"best quality, extremely detailed", standard negative prompt.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DDIMSchedule
from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.controlnet import guess_mode_scales
from fgdm_tpu.sampling.ddim import _SLOT_INIT_TAG, ddim_sample, slot_noise

A_PROMPT = "best quality, extremely detailed"
N_PROMPT = (
    "longbody, lowres, bad anatomy, bad hands, missing fingers, extra digit, "
    "fewer digits, cropped, worst quality, low quality"
)


def quantize_like_png(img01: jnp.ndarray) -> jnp.ndarray:
    """Round-trip through uint8, as the reference's PNG save/load does."""
    return jnp.round(jnp.clip(img01, 0.0, 1.0) * 255.0) / 255.0


def factor_slot_keys(slot_rngs: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Derive factor ``factor``'s per-slot keys from the chain's slot keys.

    The ONE derivation both the fused chain and the staged serving path use
    (factor 1 = condition sampler, 2 = the next factor / ControlNet render,
    …), so their outputs stay bit-identical by construction.  Slot ``b``'s
    stream depends only on ``slot_rngs[b]`` — never on batch composition."""
    return jax.vmap(lambda k: jax.random.fold_in(k, factor))(slot_rngs)


def condition_to_hint(cond_img: jnp.ndarray,
                      out_hw: Tuple[int, int]) -> jnp.ndarray:
    """[0,1] condition map → hint: the reference's uint8 PNG hop between
    factors (quantize) + bilinear resize to the render resolution.  The ONE
    implementation of this block — fgdm_chain/fgdm_chain_n/serving all call
    it, so the staged path's bit-identity with the fused chain holds by
    construction."""
    hint = quantize_like_png(cond_img)
    b, _, _, c = hint.shape
    return jax.image.resize(hint, (b, out_hw[0], out_hw[1], c), "bilinear")


def latent_to_condition_image(
    ld: LatentDiffusion, samples: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """VAE-decode factor-1 latents → [0,1] hint at ``out_hw`` (bilinear),
    with the reference's uint8 quantization hop."""
    x = ld.decode_first_stage(samples)
    img01 = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return condition_to_hint(img01, out_hw)


def sample_condition_factor(
    ld: LatentDiffusion,
    rng: jax.Array,
    cond_ctx: jnp.ndarray,        # [B,77,768] prompt embedding
    uncond_ctx: jnp.ndarray,      # [B,77,768] "" embedding
    latent_hw: Tuple[int, int] = (32, 32),
    num_steps: int = 50,
    cfg_scale: float = 7.5,
    eta: float = 0.0,
    x_T: Optional[jnp.ndarray] = None,
    slot_rngs: Optional[jnp.ndarray] = None,
    sampler: str = "ddim",
) -> jnp.ndarray:
    """Factor 1: text → condition-map latents (fused CFG).

    ``sampler`` ∈ {ddim, plms, dpm}: the chain CLI exposes the reference's
    --plms/--dpm choices (`scripts/txt2img.py:329-335`) for the condition
    factors too.  PLMS and DPM-Solver++ are deterministic after the start
    noise, so per-slot invariance holds by deriving x_T from ``slot_rngs``
    exactly as ddim_sample does.
    """
    b = cond_ctx.shape[0]
    shape = (b, latent_hw[0], latent_hw[1], ld.unet_def.in_channels)
    return _sample_factor_latents(
        ld, rng, shape, {"c_crossattn": cond_ctx},
        {"c_crossattn": uncond_ctx}, num_steps, cfg_scale, eta=eta,
        x_T=x_T, slot_rngs=slot_rngs, sampler=sampler,
    )


def _sample_factor_latents(
    ld: LatentDiffusion,
    rng: Optional[jax.Array],
    shape: Tuple[int, ...],
    cond: Dict[str, Any],
    uncond: Dict[str, Any],
    num_steps: int,
    cfg_scale: float,
    eta: float = 0.0,
    x_T: Optional[jnp.ndarray] = None,
    slot_rngs: Optional[jnp.ndarray] = None,
    sampler: str = "ddim",
) -> jnp.ndarray:
    """Condition-factor latent sampling with a sampler choice (shared by
    the 2-factor and N-factor chains)."""
    if sampler == "ddim":
        sched = DDIMSchedule.create(ld.schedule, num_steps, eta=eta)
        samples, _ = ddim_sample(
            ld.denoise_fn(), rng, shape, sched,
            cond=cond, uncond=uncond,
            cfg_scale=cfg_scale, x_T=x_T, slot_rngs=slot_rngs,
        )
        return samples
    if eta != 0.0:
        # plms: the multistep update has no stochastic term — nonzero
        # sigmas would remove variance without re-injecting it (the
        # reference PLMS asserts ddim_eta == 0).  dpm: ODE solver, no eta.
        raise ValueError(f"sampler {sampler!r} requires eta=0 (got {eta})")
    if x_T is None and slot_rngs is not None:
        x_T = slot_noise(slot_rngs, shape, _SLOT_INIT_TAG)
    if sampler == "plms":
        from fgdm_tpu.sampling.plms import plms_sample

        sched = DDIMSchedule.create(ld.schedule, num_steps, eta=eta)
        samples, _ = plms_sample(
            ld.denoise_fn(), rng, shape, sched,
            cond=cond, uncond=uncond, cfg_scale=cfg_scale, x_T=x_T,
        )
        return samples
    if sampler == "dpm":
        from fgdm_tpu.sampling.dpm_solver import dpm_solver_sample

        return dpm_solver_sample(
            ld.denoise_fn(), rng, shape, ld.schedule,
            cond, uncond, cfg_scale, steps=num_steps, x_T=x_T,
        )
    raise ValueError(f"unknown sampler {sampler!r} (ddim|plms|dpm)")


def sample_image_factor(
    cldm: ControlLDM,
    rng: jax.Array,
    hint: jnp.ndarray,            # [B,H,W,3] in [0,1]
    cond_ctx: jnp.ndarray,        # [B,77,768] prompt(+a_prompt) embedding
    uncond_ctx: jnp.ndarray,      # [B,77,768] n_prompt embedding
    num_steps: int = 20,
    cfg_scale: float = 9.0,
    eta: float = 0.0,
    strength: float = 1.0,
    guess_mode: bool = False,
    x_T: Optional[jnp.ndarray] = None,
    slot_rngs: Optional[jnp.ndarray] = None,
    sampler: str = "ddim",
) -> jnp.ndarray:
    """Factor 2: condition image → image latents via ControlNet.

    ``sampler`` ∈ {ddim, plms, dpm} — same choice as the condition
    factors; guess mode stays DDIM (its asymmetric-CFG closure is what
    the reference defines for that mode, initialize_cn.py:86-91).
    """
    sched = DDIMSchedule.create(cldm.schedule, num_steps, eta=eta)
    b, hh, ww, _ = hint.shape
    shape = (b, hh // 8, ww // 8, cldm.unet_def.in_channels)
    # The hint pyramid is step-invariant: run it once here and thread the
    # embedding through the scan instead of the raw hint (the reference
    # recomputes the 8-conv pyramid every forward, cldm.py:792-798).
    hint_emb = cldm.encode_hint(hint)
    if guess_mode and sampler != "ddim":
        raise ValueError("guess mode supports only the ddim sampler")
    if guess_mode:
        # Reference guess mode (initialize_cn.py:86-91): the uncond branch
        # gets c_concat=None — the UNet runs with NO control residuals at
        # all (a zero hint would still produce residuals) — and the control
        # scales decay geometrically.  The branches differ structurally, so
        # they are two forwards instead of one fused batch.
        cldm = cldm.replace(control_scales=guess_mode_scales(
            strength, num=len(cldm.control_scales)))

        def fn(x, t, cond_d):
            e_c = cldm.apply_model(x, t, cond_d)
            e_uc = cldm.apply_model(x, t, {"c_crossattn": uncond_ctx})
            return e_uc + cfg_scale * (e_c - e_uc)

        samples, _ = ddim_sample(
            fn, rng, shape, sched,
            cond={"c_crossattn": cond_ctx, "c_hint_emb": hint_emb},
            uncond=None, cfg_scale=1.0, x_T=x_T, slot_rngs=slot_rngs,
        )
        return samples
    if strength != 1.0:
        cldm = cldm.replace(
            control_scales=(strength,) * len(cldm.control_scales))
    # The hint rides in both cond and uncond branches
    # (initialize_cn.py:86-87), so the fused-CFG concat handles it.
    return _sample_factor_latents(
        cldm, rng, shape,
        {"c_crossattn": cond_ctx, "c_hint_emb": hint_emb},
        {"c_crossattn": uncond_ctx, "c_hint_emb": hint_emb},
        num_steps, cfg_scale, eta=eta, x_T=x_T, slot_rngs=slot_rngs,
        sampler=sampler,
    )


def fgdm_chain_n(
    factors: Sequence[LatentDiffusion],
    cldm: Optional[ControlLDM],
    rng: jax.Array,
    factor_ctxs: Sequence[jnp.ndarray],   # per-factor prompt embeddings
    empty_ctx: jnp.ndarray,               # "" embedding (factor uncond)
    cn_prompt_ctx: Optional[jnp.ndarray] = None,
    cn_neg_ctx: Optional[jnp.ndarray] = None,
    cond_hw: Tuple[int, int] = (256, 256),
    image_hw: Tuple[int, int] = (512, 512),
    factor_steps: int = 50,
    factor_scale: float = 7.5,
    f2_steps: int = 20,
    f2_scale: float = 9.0,
    all_pconds: bool = False,
    slot_rngs: Optional[jnp.ndarray] = None,
    factor_sampler: str = "ddim",
    f2_sampler: str = "ddim",
) -> Dict[str, Any]:
    """N-factor chain (text→seg→depth→normal→…→image) in one traced program
    — BASELINE config #3.

    Each condition factor k > 0 is adapter-prompted by the previous factor's
    sampled latent (``pcond``), the FG-DM conditioning mechanism
    (`/root/reference/ldm/modules/diffusionmodules/openaimodel.py:836-844`:
    adapter input = pcond when given).  With ``all_pconds=True`` and a
    ``num_prompts>1`` UNet, every earlier factor feeds an extra adapter
    (multi-adapter composition, `openaimodel.py:1291-1309`).  The optional
    ControlNet image factor renders the LAST condition map.

    Returns {'conditions': [per-factor [0,1] maps], 'image': [-1,1] or None}.
    """
    assert len(factors) == len(factor_ctxs), "one prompt ctx per factor"
    latent_hw = (cond_hw[0] // 8, cond_hw[1] // 8)
    zs = []
    for k, (ld_k, ctx_k) in enumerate(zip(factors, factor_ctxs)):
        if slot_rngs is None:
            rng, rk = jax.random.split(rng)
            sk = None
        else:
            rk, sk = None, factor_slot_keys(slot_rngs, k + 1)
        cond: Dict[str, Any] = {"c_crossattn": ctx_k}
        uncond: Dict[str, Any] = {"c_crossattn": empty_ctx}
        if k > 0:
            # chain conditioning: previous factor's latent is this factor's
            # adapter prompt (both CFG branches see it, like the hint in
            # initialize_cn.py:86-87)
            cond["pcond"] = uncond["pcond"] = zs[-1]
            if all_pconds and k > 1:
                extra = list(zs[:-1])
                cond["extra_pconds"] = uncond["extra_pconds"] = extra
        b = ctx_k.shape[0]
        shape = (b, latent_hw[0], latent_hw[1], ld_k.unet_def.in_channels)
        z_k = _sample_factor_latents(
            ld_k, rk, shape, cond, uncond, factor_steps, factor_scale,
            slot_rngs=sk, sampler=factor_sampler,
        )
        zs.append(z_k)

    conditions = [
        jnp.clip((ld_k.decode_first_stage(z_k) + 1.0) / 2.0, 0.0, 1.0)
        for ld_k, z_k in zip(factors, zs)
    ]
    image = None
    if cldm is not None:
        if slot_rngs is None:
            rng, r2 = jax.random.split(rng)
            sk = None
        else:
            r2, sk = None, factor_slot_keys(slot_rngs, len(factors) + 1)
        hint = condition_to_hint(conditions[-1], image_hw)
        z_img = sample_image_factor(
            cldm, r2, hint, cn_prompt_ctx, cn_neg_ctx,
            num_steps=f2_steps, cfg_scale=f2_scale, slot_rngs=sk,
            sampler=f2_sampler,
        )
        image = cldm.decode_first_stage(z_img)
    return {"conditions": conditions, "image": image}


def fgdm_chain(
    ld: LatentDiffusion,
    cldm: ControlLDM,
    rng: jax.Array,
    prompt_ctx: jnp.ndarray,       # factor-1 prompt embedding
    empty_ctx: jnp.ndarray,        # "" embedding (factor-1 uncond)
    cn_prompt_ctx: jnp.ndarray,    # factor-2 prompt+a_prompt embedding
    cn_neg_ctx: jnp.ndarray,       # factor-2 negative-prompt embedding
    cond_hw: Tuple[int, int] = (256, 256),
    image_hw: Tuple[int, int] = (512, 512),
    f1_steps: int = 50,
    f2_steps: int = 20,
    f1_scale: float = 7.5,
    f2_scale: float = 9.0,
    slot_rngs: Optional[jnp.ndarray] = None,
    f1_sampler: str = "ddim",
    f2_sampler: str = "ddim",
) -> Dict[str, jnp.ndarray]:
    """Full text→condition→image chain in one traceable function.

    Returns dict with 'condition' ([0,1] map at cond_hw), 'hint' (resized),
    and 'image' ([-1,1] at image_hw).

    ``slot_rngs`` ([B] per-slot keys) switches all noise to per-slot streams
    derived via :func:`factor_slot_keys` — slot results become invariant to
    batch composition (the serving micro-batching contract); ``rng`` may
    then be None.
    """
    if slot_rngs is None:
        r1, r2 = jax.random.split(rng)
        s1 = s2 = None
    else:
        r1 = r2 = None
        s1 = factor_slot_keys(slot_rngs, 1)
        s2 = factor_slot_keys(slot_rngs, 2)
    z_cond = sample_condition_factor(
        ld, r1, prompt_ctx, empty_ctx,
        latent_hw=(cond_hw[0] // 8, cond_hw[1] // 8),
        num_steps=f1_steps, cfg_scale=f1_scale, slot_rngs=s1,
        sampler=f1_sampler,
    )
    # one VAE decode serves both the returned condition map and the hint
    cond_img = jnp.clip(
        (ld.decode_first_stage(z_cond) + 1.0) / 2.0, 0.0, 1.0
    )
    hint = condition_to_hint(cond_img, image_hw)
    z_img = sample_image_factor(
        cldm, r2, hint, cn_prompt_ctx, cn_neg_ctx,
        num_steps=f2_steps, cfg_scale=f2_scale, slot_rngs=s2,
        sampler=f2_sampler,
    )
    image = cldm.decode_first_stage(z_img)
    return {"condition": cond_img, "hint": hint, "image": image}
