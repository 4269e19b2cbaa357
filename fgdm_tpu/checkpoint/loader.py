"""High-level model assembly from torch checkpoints.

Reproduces the reference entry-point loading semantics:
``load_model_from_config`` (`/root/reference/scripts/txt2img_fgdm_inference.py
:23-38`) — build the model from config, load ``sd-v1-4.ckpt``-style weights
with ``strict=False`` — and ``initialize_controlnet``
(`controlnet/initialize_cn.py:25-41`) for the ``fgdm_control_sd15_*.pth``
second stage.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.checkpoint import torch_ingest as ti
from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet
from fgdm_tpu.models.unet import UNetModel

SD_SCHEDULE = dict(timesteps=1000, beta_schedule="linear",
                   linear_start=0.00085, linear_end=0.0120)


def sd_unet(dtype=jnp.bfloat16, **overrides) -> UNetModel:
    """SD-1.4 UNet config (models/config.yaml:33-48)."""
    cfg = dict(in_channels=4, out_channels=4, model_channels=320,
               num_res_blocks=2, attention_resolutions=(4, 2, 1),
               channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
               context_dim=768, dtype=dtype)
    cfg.update(overrides)
    return UNetModel(**cfg)


def sd_vae(dtype=jnp.bfloat16, **overrides) -> AutoencoderKL:
    cfg = dict(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
               attn_resolutions=(), z_channels=4, resolution=256, dtype=dtype)
    cfg.update(overrides)
    return AutoencoderKL(**cfg)


def sd_clip(dtype=jnp.bfloat16) -> CLIPTextEncoder:
    return CLIPTextEncoder(dtype=dtype)


def sd_controlnet(dtype=jnp.bfloat16, **overrides) -> ControlNet:
    cfg = dict(in_channels=4, model_channels=320, hint_channels=3,
               num_res_blocks=2, attention_resolutions=(4, 2, 1),
               channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768,
               dtype=dtype)
    cfg.update(overrides)
    return ControlNet(**cfg)


def _abstract_init(module, *args, **kwargs):
    """Zero-filled expect tree for checkpoint ingest (shapes only — every
    leaf is overwritten by the checkpoint or re-initialized for real by
    ``_fill_missing_from_init``)."""
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: module.init(rng, *args, **kwargs))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _real_init(module, seed, *args, **kwargs):
    """Genuine module init for the no-checkpoint path: a 'random init' model
    must be alive (the zero expect tree would make every forward constant).
    Un-jitted: bool kwargs like ``sample_posterior`` must stay static."""
    return module.init(jax.random.PRNGKey(seed), *args, **kwargs)


def _fill_missing_from_init(params, missing, module, init_args,
                            init_kwargs=None, label="", verbose=True):
    """strict=False parity: keys absent from the checkpoint keep the
    module's *real* init (the reference keeps torch's random init,
    ddpm.py:244-270), not the zeros of the abstract expect tree."""
    if not missing:
        return params
    from flax import traverse_util

    real = module.init(jax.random.PRNGKey(0), *init_args,
                       **(init_kwargs or {}))
    flat = traverse_util.flatten_dict(params, sep="/")
    rflat = traverse_util.flatten_dict(real, sep="/")
    for k in missing:
        flat[k] = rflat[k]
    if verbose:
        heads = sorted({"/".join(k.split("/")[:3]) for k in missing})
        print(f"[load] {label}: {len(missing)} params kept at module init "
              f"(subtrees: {heads[:6]}{'…' if len(heads) > 6 else ''})")
    return traverse_util.unflatten_dict(flat, sep="/")


def load_fgdm(
    ckpt_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    latent_size: int = 32,
    use_time_adapter: bool = False,
    ignore_keys: Sequence[str] = ("model_ema.",),
    verbose: bool = True,
    unet: Optional[UNetModel] = None,
    vae: Optional[AutoencoderKL] = None,
    clip: Optional[CLIPTextEncoder] = None,
    schedule: Optional[DiffusionSchedule] = None,
    scale_factor: float = 0.18215,
    conditioning_key: str = "crossattn",
) -> LatentDiffusion:
    """Assemble the FG-DM condition-factor model (UNet+adapter, VAE, CLIP)
    and optionally populate from a torch checkpoint.  Module defs, schedule,
    scale_factor and conditioning_key default to SD-1.x but honor whatever a
    parsed config passes in (builders.ModelSpec.load)."""
    unet = unet or sd_unet(dtype=dtype, use_time_adapter=use_time_adapter)
    vae = vae or sd_vae(dtype=dtype)
    clip = clip or sd_clip(dtype=dtype)

    x = jnp.zeros((1, latent_size, latent_size, unet.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = (jnp.zeros((1, clip.max_length, clip.embed_dim))
           if unet.context_dim else None)
    img = jnp.zeros((1, latent_size * 8, latent_size * 8, vae.in_channels))
    ids = jnp.zeros((1, clip.max_length), jnp.int32)
    unet_kwargs = {}
    if unet.num_prompts > 1:
        # multi-adapter (AdaptUNetModel): extra adapters only materialize
        # when extra_pconds are traced at init
        unet_kwargs["extra_pconds"] = [x] * (unet.num_prompts - 1)
    if not ckpt_path:
        unet_params = _real_init(unet, 0, x, t, ctx, **unet_kwargs)
        vae_params = _real_init(vae, 1, img, sample_posterior=False)
        clip_params = _real_init(clip, 2, ids)
    else:
        unet_params = _abstract_init(unet, x, t, ctx, **unet_kwargs)
        vae_params = _abstract_init(vae, img, sample_posterior=False)
        clip_params = _abstract_init(clip, ids)

    if ckpt_path:
        sd = ti.load_torch_state_dict(ckpt_path)
        sd = ti.apply_key_surgery(sd, ignore_keys=ignore_keys)
        unet_params, m1, u1 = ti.ingest_unet(sd, expect=unet_params)
        vae_params, m2, _ = ti.ingest_vae(sd, expect=vae_params)
        clip_params, m3, _ = ti.ingest_clip(sd, expect=clip_params)
        if verbose:
            print(f"[load_fgdm] {ckpt_path}: missing unet={len(m1)} "
                  f"vae={len(m2)} clip={len(m3)} unexpected={len(u1)}")
        unet_params = _fill_missing_from_init(
            unet_params, m1, unet, (x, t, ctx), unet_kwargs, label="unet",
            verbose=verbose)
        vae_params = _fill_missing_from_init(
            vae_params, m2, vae, (img,), {"sample_posterior": False},
            label="vae", verbose=verbose)
        clip_params = _fill_missing_from_init(
            clip_params, m3, clip, (ids,), label="clip", verbose=verbose)

    return LatentDiffusion(
        unet_def=unet, vae_def=vae, clip_def=clip,
        conditioning_key=conditioning_key,
        scale_factor=scale_factor,
        unet_params=jax.tree.map(jnp.asarray, unet_params),
        vae_params=jax.tree.map(jnp.asarray, vae_params),
        clip_params=jax.tree.map(jnp.asarray, clip_params),
        schedule=schedule or DiffusionSchedule.create(**SD_SCHEDULE),
    )


def load_controlnet(
    ckpt_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    latent_size: int = 64,
    share_first_stage: Optional[LatentDiffusion] = None,
    verbose: bool = True,
    unet: Optional[UNetModel] = None,
    cn=None,
    vae: Optional[AutoencoderKL] = None,
    clip: Optional[CLIPTextEncoder] = None,
    schedule: Optional[DiffusionSchedule] = None,
    scale_factor: float = 0.18215,
) -> ControlLDM:
    """Assemble the seg→image ControlLDM (SD UNet + control branch).

    Module definitions default to the SD-1.5 layout; a parsed cldm config
    (``builders.build_control_ldm``) passes its own defs through."""
    unet = unet if unet is not None else sd_unet(dtype=dtype, use_adapter=False)
    cn = cn if cn is not None else sd_controlnet(dtype=dtype)
    vae = vae if vae is not None else sd_vae(dtype=dtype)
    clip = clip if clip is not None else sd_clip(dtype=dtype)

    x = jnp.zeros((1, latent_size, latent_size, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1,
                     clip.max_length if clip is not None else 77,
                     unet.context_dim or 768))
    hint = jnp.zeros((1, latent_size * 8, latent_size * 8, 3))
    init = _abstract_init if ckpt_path else (
        lambda m, *a, **kw: _real_init(m, 0, *a, **kw))
    unet_params = init(unet, x, t, ctx)
    cn_params = init(cn, x, hint, t, ctx)
    if share_first_stage is not None:
        vae_params = share_first_stage.vae_params
        clip_params = share_first_stage.clip_params
    else:
        vae_params = init(vae, jnp.zeros((1, 256, 256, 3)),
                          sample_posterior=False)
        clip_params = init(clip, jnp.zeros((1, clip.max_length), jnp.int32))

    if ckpt_path:
        sd = ti.load_torch_state_dict(ckpt_path)
        unet_params, m1, _ = ti.ingest_unet(sd, expect=unet_params)
        cn_params, m2, _ = ti.ingest_controlnet(sd, expect=cn_params)
        if share_first_stage is None:
            vae_params, mv, _ = ti.ingest_vae(sd, expect=vae_params)
            clip_params, mc, _ = ti.ingest_clip(sd, expect=clip_params)
            vae_params = _fill_missing_from_init(
                vae_params, mv, vae, (jnp.zeros((1, 256, 256, 3)),),
                {"sample_posterior": False}, label="cn-vae", verbose=verbose)
            clip_params = _fill_missing_from_init(
                clip_params, mc, clip, (jnp.zeros((1, clip.max_length), jnp.int32),),
                label="cn-clip", verbose=verbose)
        if verbose:
            print(f"[load_controlnet] {ckpt_path}: missing unet={len(m1)} "
                  f"control={len(m2)}")
        unet_params = _fill_missing_from_init(
            unet_params, m1, unet, (x, t, ctx), label="cn-unet",
            verbose=verbose)
        cn_params = _fill_missing_from_init(
            cn_params, m2, cn, (x, hint, t, ctx), label="controlnet",
            verbose=verbose)

    return ControlLDM(
        unet_def=unet, vae_def=vae, clip_def=clip,
        unet_params=jax.tree.map(jnp.asarray, unet_params),
        vae_params=jax.tree.map(jnp.asarray, vae_params),
        clip_params=jax.tree.map(jnp.asarray, clip_params),
        schedule=(schedule if schedule is not None
                  else DiffusionSchedule.create(**SD_SCHEDULE)),
        scale_factor=scale_factor,
        control_def=cn,
        control_params=jax.tree.map(jnp.asarray, cn_params),
    )
