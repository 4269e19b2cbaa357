"""FG-DM side adapter networks (T2I-Adapter style conv pyramids).

Mirrors `/root/reference/ldm/modules/encoders/adapter.py`:
``AdapterResnetBlock`` (`:280-313`): optional 2× avg-pool down, optional 1×1
in-conv on channel transitions (``sk=True`` skips it otherwise), conv3×3 →
ReLU → conv(ksize) with identity residual.  ``Adapter`` (`:316-346`):
``conv_in`` 3×3 then ``len(channels) × nums_rb`` blocks, emitting one feature
per scale.  ``TimeAdapter`` (`:387-417`) swaps the blocks for timestep-
conditioned UNet ``ResBlock``s (emb_ch 1280).

The shipped FG-DM config uses ``channels=[320,640,1280,1280], nums_rb=2,
ksize=1, sk=True, use_conv=False`` (`openaimodel.py:548-556`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.blocks import ResBlock
from fgdm_tpu.nn.layers import Conv2d, avg_pool_2x2

Dtype = Any


class AdapterResnetBlock(nn.Module):
    in_c: int
    out_c: int
    down: bool = False
    ksize: int = 3
    sk: bool = False
    use_conv: bool = True   # learned (conv) downsample vs avg-pool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ps = self.ksize // 2
        if self.down:
            if self.use_conv:
                x = Conv2d(self.in_c, kernel_size=3, stride=2, padding=1,
                           dtype=self.dtype, name="down_opt")(x)
            else:
                x = avg_pool_2x2(x)
        if self.in_c != self.out_c or not self.sk:
            x = Conv2d(self.out_c, kernel_size=self.ksize, padding=ps,
                       dtype=self.dtype, name="in_conv")(x)
        h = Conv2d(self.out_c, kernel_size=3, padding=1, dtype=self.dtype,
                   name="block1")(x)
        h = jax.nn.relu(h)
        h = Conv2d(self.out_c, kernel_size=self.ksize, padding=ps,
                   dtype=self.dtype, name="block2")(h)
        if not self.sk:
            skip = Conv2d(self.out_c, kernel_size=self.ksize, padding=ps,
                          dtype=self.dtype, name="skep")(x)
            return h + skip
        return h + x


class Adapter(nn.Module):
    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    cin: int = 4
    ksize: int = 1
    sk: bool = True
    use_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, ...]:
        del emb
        features = []
        x = Conv2d(self.channels[0], kernel_size=3, padding=1,
                   dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.channels):
            for j in range(self.nums_rb):
                idx = i * self.nums_rb + j
                trans = (i != 0) and (j == 0)
                x = AdapterResnetBlock(
                    in_c=self.channels[i - 1] if trans else ch,
                    out_c=ch,
                    down=trans,
                    ksize=self.ksize,
                    sk=self.sk,
                    use_conv=self.use_conv,
                    dtype=self.dtype,
                    name=f"body_{idx}",
                )(x)
            features.append(x)
        return tuple(features)


class ResnetBlockLight(nn.Module):
    """conv3×3 → ReLU → conv3×3 with identity skip (adapter.py:420-432)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.channels, kernel_size=3, dtype=self.dtype,
                   name="block1")(x)
        h = jax.nn.relu(h)
        h = Conv2d(self.channels, kernel_size=3, dtype=self.dtype,
                   name="block2")(h)
        return h + x


class Extractor(nn.Module):
    """1×1 in → N light blocks → 1×1 out, optional avg-pool down
    (adapter.py:435-456)."""

    inter_c: int
    out_c: int
    nums_rb: int = 3
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.down:
            x = avg_pool_2x2(x)
        x = Conv2d(self.inter_c, kernel_size=1, padding=0, dtype=self.dtype,
                   name="in_conv")(x)
        for i in range(self.nums_rb):
            x = ResnetBlockLight(self.inter_c, dtype=self.dtype,
                                 name=f"body_{i}")(x)
        return Conv2d(self.out_c, kernel_size=1, padding=0, dtype=self.dtype,
                      name="out_conv")(x)


def pixel_unshuffle(x: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """NHWC space-to-depth (torch PixelUnshuffle equivalent)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // factor, w // factor, c * factor * factor)


class AdapterLight(nn.Module):
    """Pixel-unshuffle light adapter (adapter.py:458-481): the 8× space-to-
    depth input feeds a 4-scale extractor pyramid at quarter inner width."""

    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 3
    cin: int = 192   # 3 × 8² after unshuffle
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, ...]:
        del emb
        x = pixel_unshuffle(x, 8)
        features = []
        for i, ch in enumerate(self.channels):
            x = Extractor(inter_c=ch // 4, out_c=ch, nums_rb=self.nums_rb,
                          down=i > 0, dtype=self.dtype, name=f"body_{i}")(x)
            features.append(x)
        return tuple(features)


class TimeAdapter(nn.Module):
    """Adapter whose blocks are timestep-conditioned UNet ResBlocks."""

    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    cin: int = 4
    ksize: int = 1
    sk: bool = True
    emb_ch: int = 1280
    use_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, ...]:
        features = []
        x = Conv2d(self.channels[0], kernel_size=3, padding=1,
                   dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.channels):
            for j in range(self.nums_rb):
                idx = i * self.nums_rb + j
                trans = (i != 0) and (j == 0)
                x = ResBlock(
                    channels=self.channels[i - 1] if trans else ch,
                    emb_channels=self.emb_ch,
                    out_channels=ch,
                    down=trans,
                    use_conv=self.use_conv,
                    dtype=self.dtype,
                    name=f"body_{idx}",
                )(x, emb)
            features.append(x)
        return tuple(features)
