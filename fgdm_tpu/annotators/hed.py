"""HED edge detector (ControlNetHED) — the sketch-FG-DM training annotator.

Mirrors `/root/reference/ldm/models/hed.py:17-80`: a learned per-channel
input shift, 5 VGG-ish DoubleConvBlocks (2/2/3/3/3 convs, max-pool between
stages) each with a 1×1 edge projection; the 5 projections are bilinearly
upsampled to input size, channel-averaged, squashed by a sigmoid, and
replicated to 3 channels in [-1, 1].  Runs batched inside the training step
(the reference calls it per batch on the fly, ddpm.py:141-145).

Weights ingest from ``ControlNetHED.pth`` via
``fgdm_tpu.checkpoint.annotator_ingest``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d

Dtype = Any


class DoubleConvBlock(nn.Module):
    out_channels: int
    layer_number: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, down_sampling: bool = False):
        h = x
        if down_sampling:
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i in range(self.layer_number):
            h = Conv2d(self.out_channels, kernel_size=3, dtype=self.dtype,
                       name=f"convs_{i}")(h)
            h = jax.nn.relu(h)
        proj = Conv2d(1, kernel_size=1, padding=0, dtype=self.dtype,
                      name="projection")(h)
        return h, proj


class ControlNetHED(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B,H,W,3] in [-1,1] → edge map [B,H,W,3] in [-1,1]."""
        b, H, W, _ = x.shape
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3),
                          jnp.float32)
        h = (x + 1.0) * 127.5 - norm
        projs = []
        chans = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for i, (c, ln) in enumerate(chans):
            h, p = DoubleConvBlock(c, ln, dtype=self.dtype,
                                   name=f"block{i + 1}")(h, down_sampling=i > 0)
            projs.append(p)
        ups = [
            jax.image.resize(p, (b, H, W, 1), "bilinear") for p in projs
        ]
        edges = jnp.concatenate(ups, axis=-1)
        edge = jax.nn.sigmoid(jnp.mean(edges.astype(jnp.float32), axis=-1))
        edge = edge * 2.0 - 1.0
        return jnp.repeat(edge[..., None], 3, axis=-1)
