"""Latent diffusion pipeline: UNet + frozen VAE + frozen CLIP, functional.

The reference fuses runtime and model into one ``LatentDiffusion``
LightningModule (`/root/reference/ldm/models/diffusion/ddpm.py:510-1820`).
Here the same capabilities are split TPU-first:

* ``LatentDiffusion`` is an immutable pytree (flax.struct) bundling module
  *definitions* (static) and parameter trees (leaves) — pass it straight
  through ``jit``/``pjit``; XLA treats the params as ordinary inputs.
* ``apply_model`` reproduces the conditioning router
  (`ddpm.py:1822-1848`): ``conditioning_key`` ∈ {none, concat, crossattn,
  hybrid, adm} maps the cond dict onto UNet kwargs; ``pcond`` carries the
  adapter prompt, ``adapter_on=False`` is the frozen-SD teacher path
  (reference ``use_original=True``).
* ``encode_first_stage`` / ``decode_first_stage`` apply the 0.18215
  ``scale_factor`` exactly as `ddpm.py:565,732-763`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.models.autoencoder import AutoencoderKL, DiagonalGaussian
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel

Cond = Dict[str, Any]


@struct.dataclass
class LatentDiffusion:
    # static module definitions
    unet_def: UNetModel = struct.field(pytree_node=False)
    vae_def: AutoencoderKL = struct.field(pytree_node=False)
    clip_def: Optional[CLIPTextEncoder] = struct.field(pytree_node=False)
    conditioning_key: str = struct.field(pytree_node=False, default="crossattn")
    scale_factor: float = struct.field(pytree_node=False, default=0.18215)
    # parameters (pytree leaves)
    unet_params: Any = None
    vae_params: Any = None
    clip_params: Any = None
    schedule: DiffusionSchedule = None

    # -- cond stage ---------------------------------------------------------
    def get_learned_conditioning(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.clip_def.apply(self.clip_params, input_ids)

    # -- first stage --------------------------------------------------------
    def encode_first_stage(
        self, img: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """img [B,H,W,3] in [-1,1] → scaled latent [B,H/8,W/8,4]."""
        posterior = self.vae_def.apply(
            self.vae_params, img, method=AutoencoderKL.encode
        )
        z = posterior.sample(rng) if rng is not None else posterior.mode()
        return self.scale_factor * z

    def decode_first_stage(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.vae_def.apply(
            self.vae_params, z / self.scale_factor, method=AutoencoderKL.decode
        )

    # -- model dispatch -----------------------------------------------------
    def apply_model(
        self,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[Cond],
        adapter_on: bool = True,
        capture: bool = False,
    ):
        """Conditioning router (reference DiffusionWrapper, ddpm.py:1822-1848)."""
        cond = cond or {}
        kwargs: Dict[str, Any] = {}
        key = self.conditioning_key
        xc = x_noisy
        if key in ("concat", "hybrid"):
            cc = cond["c_concat"]
            xc = jnp.concatenate([x_noisy, cc], axis=-1)
        if key in ("crossattn", "hybrid"):
            kwargs["context"] = cond["c_crossattn"]
        if key == "adm":
            kwargs["y"] = cond["c_adm"]
        if "pcond" in cond and cond["pcond"] is not None:
            kwargs["pcond"] = cond["pcond"]
        if "extra_pconds" in cond and cond["extra_pconds"] is not None:
            # multi-adapter composition (AdaptUNetModel, openaimodel.py:
            # 1291-1309): earlier chain factors feed the extra adapters
            kwargs["extra_pconds"] = cond["extra_pconds"]
        return self.unet_def.apply(
            self.unet_params, xc, t, adapter_on=adapter_on, capture=capture,
            **kwargs,
        )

    def denoise_fn(self, adapter_on: bool = True):
        """Closure with (x, t, cond) -> eps signature for the samplers."""

        def fn(x, t, cond):
            return self.apply_model(x, t, cond, adapter_on=adapter_on)

        return fn

    def capture_fn(self, adapter_on: bool = True, mode: str = "probs"):
        """Closure with (x, t, cond) -> (eps, selfattn, crossattn) for the
        attention-guided sampler (reference return_ids=True path)."""

        def fn(x, t, cond):
            return self.apply_model(x, t, cond, adapter_on=adapter_on,
                                    capture=mode)

        return fn

    # -- q / p math (delegates to schedule) ---------------------------------
    def q_sample(self, x_start, t, noise):
        return self.schedule.q_sample(x_start, t, noise)

    def calibrate_scale_by_std(self, probe_images: jnp.ndarray,
                               rng: Optional[jax.Array] = None
                               ) -> "LatentDiffusion":
        """``scale_by_std`` auto-calibration: set scale_factor to
        1/std(encoded probe batch), as the reference does on the first
        training batch (ddpm.py:580-597)."""
        z = self.replace(scale_factor=1.0).encode_first_stage(
            probe_images, rng)
        std = float(jnp.std(z.astype(jnp.float32)))
        return self.replace(scale_factor=1.0 / std)

    @staticmethod
    def create(
        unet_def: UNetModel,
        vae_def: AutoencoderKL,
        clip_def: Optional[CLIPTextEncoder],
        rng: jax.Array,
        latent_size: int = 32,
        conditioning_key: str = "crossattn",
        scale_factor: float = 0.18215,
        schedule: Optional[DiffusionSchedule] = None,
        init_first_stage: bool = True,
    ) -> "LatentDiffusion":
        """Random-init factory (checkpoint ingest overwrites params)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, latent_size, latent_size, unet_def.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = (
            jnp.zeros((1, clip_def.max_length, clip_def.embed_dim))
            if clip_def is not None and unet_def.context_dim
            else None
        )
        unet_params = unet_def.init(r1, x, t, ctx)
        vae_params = None
        if init_first_stage:
            img = jnp.zeros((1, latent_size * 8, latent_size * 8, vae_def.in_channels))
            vae_params = vae_def.init(r2, img, sample_posterior=False)
        clip_params = (
            clip_def.init(r3, jnp.zeros((1, clip_def.max_length), jnp.int32))
            if clip_def is not None
            else None
        )
        return LatentDiffusion(
            unet_def=unet_def,
            vae_def=vae_def,
            clip_def=clip_def,
            conditioning_key=conditioning_key,
            scale_factor=scale_factor,
            unet_params=unet_params,
            vae_params=vae_params,
            clip_params=clip_params,
            schedule=schedule
            or DiffusionSchedule.create(
                timesteps=1000, beta_schedule="linear",
                linear_start=0.00085, linear_end=0.0120,
            ),
        )
