"""Control-conditioned latent diffusion (the seg→image stage).

Mirrors `/root/reference/controlnet/cldm/cldm.py:816-943` (``ControlLDM``):
``apply_model`` runs the ControlNet branch on the hint, scales its 13
residuals by ``control_scales`` (constant 1.0, or guess-mode geometric decay
`initialize_cn.py:91`), and feeds them to the frozen SD UNet.  The whole
thing is one traced program — no CPU/GPU model shuttling (`low_vram_shift`)
is needed on TPU; HBM holds both branches.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet
from fgdm_tpu.models.unet import UNetModel

Cond = Dict[str, Any]


@struct.dataclass
class ControlLDM(LatentDiffusion):
    control_def: ControlNet = struct.field(pytree_node=False, default=None)
    only_mid_control: bool = struct.field(pytree_node=False, default=False)
    control_params: Any = None
    control_scales: Tuple[float, ...] = struct.field(
        pytree_node=False, default=(1.0,) * 13
    )

    def apply_model(
        self,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[Cond],
        adapter_on: bool = True,
        capture: bool = False,
    ):
        cond = cond or {}
        context = cond.get("c_crossattn")
        hint = cond.get("c_concat")
        hint_emb = cond.get("c_hint_emb")
        control = None
        if hint is not None or hint_emb is not None:
            control = self.control_def.apply(
                self.control_params, x_noisy, hint, t, context,
                hint_emb=hint_emb,
            )
            control = tuple(
                c * s for c, s in zip(control, self.control_scales)
            )
        return self.unet_def.apply(
            self.unet_params, x_noisy, t, context=context,
            control=control, only_mid_control=self.only_mid_control,
            adapter_on=False, capture=capture,
        )

    def encode_hint(self, hint: jnp.ndarray) -> jnp.ndarray:
        """Hint pyramid only: [B,H,W,3] in [0,1] → [B,H/8,W/8,mc].

        The result is step-invariant, so samplers run this once and pass
        it per step as ``cond['c_hint_emb']`` instead of ``c_concat``,
        hoisting the pyramid (first conv at full render resolution) out
        of the denoise scan."""
        return self.control_def.apply(
            self.control_params, None, hint, None, None, hint_only=True
        )

    @staticmethod
    def create_control(
        unet_def: UNetModel,
        vae_def: AutoencoderKL,
        clip_def: Optional[CLIPTextEncoder],
        control_def: ControlNet,
        rng: jax.Array,
        latent_size: int = 64,
        scale_factor: float = 0.18215,
        schedule: Optional[DiffusionSchedule] = None,
        init_first_stage: bool = True,
        control_scales: Tuple[float, ...] = (1.0,) * 13,
    ) -> "ControlLDM":
        base = LatentDiffusion.create(
            unet_def, vae_def, clip_def, rng, latent_size=latent_size,
            scale_factor=scale_factor, schedule=schedule,
            init_first_stage=init_first_stage,
        )
        x = jnp.zeros((1, latent_size, latent_size, unet_def.in_channels))
        hint = jnp.zeros(
            (1, latent_size * 8, latent_size * 8, control_def.hint_channels)
        )
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, clip_def.max_length, clip_def.embed_dim))
        control_params = control_def.init(jax.random.fold_in(rng, 7), x, hint, t, ctx)
        return ControlLDM(
            unet_def=base.unet_def,
            vae_def=base.vae_def,
            clip_def=base.clip_def,
            conditioning_key="crossattn",
            scale_factor=base.scale_factor,
            unet_params=base.unet_params,
            vae_params=base.vae_params,
            clip_params=base.clip_params,
            schedule=base.schedule,
            control_def=control_def,
            control_params=control_params,
            control_scales=control_scales,
        )
