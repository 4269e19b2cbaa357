"""Joint two-factor UNet: a differentiable condition→image chain in one
forward pass.

Mirrors `/root/reference/controlnet/cldm/cldm.py:53-296`
(``SeqTwoUNetModel``) and `:299-542` (``ControlledSeqTwoUNetModel``): the
latent is channel-chunked into (image-half, condition-half); ``unet2``
denoises the condition half, its x₀ prediction (own schedule buffers,
clamped to [-1,1]) is channel-mapped and concatenated into ``unet1``'s
input, so the image factor conditions on the *denoised* condition factor at
every step.  Output = concat(eps_image, eps_cond).

This is the mechanism behind the joint text→seg→image training and the
``return_conds`` co-denoising path in the reference DDIM sampler
(`ldm/models/diffusion/ddim.py:143-176,224-243`) — with both eps heads
produced by one forward, the standard DDIM scan co-denoises both factors.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.nn.layers import Conv2d

Dtype = Any


class SeqTwoUNet(nn.Module):
    """Two chained UNets over a channel-stacked two-factor latent."""

    factor_channels: int = 4        # channels per factor (4 latent / 3 pixel)
    mapped_channels: int = 4        # condition x0 channels fed to unet1
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: Optional[int] = 768
    use_map_channel_mapper: bool = True
    use_control: bool = False       # unet2 consumes ControlNet residuals
    # AdaptDiffusion mode (`ldm/models/diffusion/ddpm.py:1851-1927`): the
    # image factor conditions on the denoised condition factor through an
    # FG-DM *adapter* on unet1 (the reference optimizes only params named
    # 'joint_image_adapter' — a module absent from the shipped repo; this is
    # its concrete realization) instead of channel concatenation.
    image_adapter: bool = False
    remat: bool = False             # forwarded to both UNets (use_checkpoint)
    dtype: Dtype = jnp.bfloat16
    # schedule for in-forward x0 prediction (matches the diffusion process)
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    timesteps: int = 1000

    def setup(self):
        common = dict(
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult,
            num_heads=self.num_heads,
            transformer_depth=self.transformer_depth,
            context_dim=self.context_dim,
            use_adapter=False,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.unet2 = UNetModel(
            in_channels=self.factor_channels,
            out_channels=self.factor_channels, **common, name="unet2",
        )
        if self.image_adapter:
            u1 = dict(common, use_adapter=True)
            self.unet1 = UNetModel(
                in_channels=self.factor_channels,
                out_channels=self.factor_channels,
                adapter_channels=self.mapped_channels,
                **u1, name="unet1",
            )
        else:
            self.unet1 = UNetModel(
                in_channels=self.factor_channels + self.mapped_channels,
                out_channels=self.factor_channels, **common, name="unet1",
            )
        if self.use_map_channel_mapper:
            self.channel_mapper = Conv2d(
                self.mapped_channels, kernel_size=1, padding=0,
                use_bias=False, dtype=self.dtype, name="channel_mapper",
            )
        self.schedule = DiffusionSchedule.create(
            timesteps=self.timesteps, beta_schedule="linear",
            linear_start=self.linear_start, linear_end=self.linear_end,
        )

    def __call__(
        self,
        x: jnp.ndarray,                     # [B,H,W,2*factor_channels]
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        cond_map: Optional[jnp.ndarray] = None,   # bypass: known condition
        control: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        h1, h2 = jnp.split(x, 2, axis=-1)

        if cond_map is not None:
            h2_recon = cond_map
            eps2 = jnp.zeros_like(h2)
        else:
            kwargs = {}
            if self.use_control and control is not None:
                kwargs["control"] = control
            eps2 = self.unet2(h2, timesteps, context=context, **kwargs)
            h2_recon = jnp.clip(
                self.schedule.predict_start_from_noise(
                    h2.astype(jnp.float32), timesteps, eps2
                ),
                -1.0, 1.0,
            )
        if self.use_map_channel_mapper:
            h2_recon = self.channel_mapper(h2_recon.astype(self.dtype))

        if self.image_adapter:
            eps1 = self.unet1(
                h1, timesteps, context=context,
                pcond=h2_recon.astype(h1.dtype),
            )
        else:
            eps1 = self.unet1(
                jnp.concatenate([h1, h2_recon.astype(h1.dtype)], axis=-1),
                timesteps, context=context,
            )
        return jnp.concatenate([eps1, eps2], axis=-1)


def joint_denoise_fn(model: SeqTwoUNet, params):
    """(x, t, cond) → stacked eps for the standard DDIM/PLMS scan — both
    factors co-denoise under one sampler (the reference threads a second
    latent `x2` through the sampler by hand; here it's just channels)."""

    def fn(x, t, cond):
        ctx = cond.get("c_crossattn") if cond else None
        return model.apply(params, x, t, context=ctx)

    return fn
