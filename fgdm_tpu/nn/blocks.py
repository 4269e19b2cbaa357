"""UNet residual / resampling blocks (NHWC flax).

Mirrors `/root/reference/ldm/modules/diffusionmodules/openaimodel.py`:
``ResBlock`` (`:223-302`): GroupNorm→SiLU→conv, timestep-emb injection
(additive, or FiLM when ``use_scale_shift_norm``), GroupNorm→SiLU→zero-conv,
learned or identity skip.  ``Upsample`` (`:95-120`): nearest 2× + optional
conv.  ``Downsample`` (`:146-168`): stride-2 conv or 2×2 avg-pool.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import (
    Conv2d,
    Dense,
    FusedGroupNormSiLU,
    GroupNorm32,
    avg_pool_2x2,
    nearest_upsample_2x,
)

Dtype = Any


def silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


class Upsample(nn.Module):
    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = Conv2d(out_ch, kernel_size=3, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels
        if self.use_conv:
            return Conv2d(out_ch, kernel_size=3, stride=2, padding=1,
                          dtype=self.dtype, name="op")(x)
        assert out_ch == self.channels
        return avg_pool_2x2(x)


class ResBlock(nn.Module):
    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    use_conv: bool = False          # 3x3 (vs 1x1) learned skip when ch changes
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    fused_norm: bool = False        # Pallas GroupNorm+SiLU (same params)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels

        if self.fused_norm:
            h = FusedGroupNormSiLU(name="in_norm")(x)
        else:
            h = GroupNorm32(name="in_norm")(x)
            h = silu(h)
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = avg_pool_2x2(h)
            x = avg_pool_2x2(x)
        h = Conv2d(out_ch, kernel_size=3, dtype=self.dtype, name="in_conv")(h)

        emb_out = Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj",
        )(silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = silu(h)
        elif self.fused_norm:
            h = FusedGroupNormSiLU(name="out_norm")(h + emb_out)
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
            h = silu(h)
        h = Conv2d(out_ch, kernel_size=3, zero_init=True, dtype=self.dtype,
                   name="out_conv")(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = Conv2d(out_ch, kernel_size=3, dtype=self.dtype,
                          name="skip_connection")(x)
        else:
            skip = Conv2d(out_ch, kernel_size=1, padding=0, dtype=self.dtype,
                          name="skip_connection")(x)
        return skip + h
