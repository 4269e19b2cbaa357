"""Primitive layers shared across the framework (NHWC, mixed precision).

Design: parameters are stored in float32; compute dtype is configurable
(bfloat16 on TPU).  Normalizations always compute in float32 and cast back,
mirroring the reference's `GroupNorm32` / fp16-safe LayerNorm
(`/root/reference/ldm/modules/diffusionmodules/util.py:219-225`,
`/root/reference/ldm/modules/encoders/adapter.py:349-355`).

Layout is NHWC throughout — the native layout for TPU convolutions — unlike
the reference's NCHW.  The torch-checkpoint ingester does the transposition.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Pallas direct 3×3 conv for VMEM-resident planes (kernels/conv.py);
# measured slower than XLA convs in the chain A/B (NEXT.md) — off.
_PALLAS_CONV = os.environ.get("FGDM_PALLAS_CONV", "0") == "1"
# Height-slab Pallas conv for the VAE decoder's large low-channel planes
# (kernels/conv.py:conv3x3_vae_ok): +67% over XLA standalone at
# 512²·128→128, but a wash in the chain A/B (1.6199 vs 1.6188 img/s —
# in-program XLA convs fuse epilogues and pipeline, standalone numbers
# overstate them) at +114s of Mosaic compile — off, same policy as the
# other conv reformulations (NEXT.md: chain A/B is the decider).
_PALLAS_CONV_VAE = os.environ.get("FGDM_PALLAS_CONV_VAE", "0") == "1"
# Winograd F(2,3) reformulation (kernels/winograd.py): 2.25× fewer MXU
# FLOPs per 3×3 conv; parity-tested, awaiting an on-chip chain A/B — off.
_WINOGRAD_CONV = os.environ.get("FGDM_WINOGRAD_CONV", "0") == "1"

Dtype = Any

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "LayerNorm32",
    "Conv2d",
    "Dense",
    "avg_pool_2x2",
    "nearest_upsample_2x",
]


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding; matches reference `util.py:160-180`
    (cos first, then sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32, output cast back to input dtype.

    Matches torch ``GroupNorm(32, ch)`` (eps 1e-5 default; the VAE uses 1e-6
    — reference `ldm/modules/diffusionmodules/model.py` `Normalize`).
    """

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(jnp.float32)
        g = self.num_groups
        spatial = x.shape[1:-1]
        xg = x.reshape(x.shape[0], -1, g, c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        x = xg.reshape((x.shape[0],) + spatial + (c,))
        x = x * scale + bias
        return x.astype(orig_dtype)


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm+SiLU with the same param schema as GroupNorm32, routed
    through the Pallas fused kernel on TPU (kernels/groupnorm.py)."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fgdm_tpu.kernels.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu(x, scale, bias, num_groups=self.num_groups,
                               eps=self.eps, apply_silu=True)


class LayerNorm32(nn.Module):
    """LayerNorm computed in float32 (fp16/bf16-safe)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        x = x * scale + bias
        return x.astype(orig_dtype)


class Conv2d(nn.Module):
    """NHWC conv with float32 params, compute in ``dtype``.

    ``zero_init=True`` reproduces the reference's ``zero_module`` convs
    (UNet out conv, transformer proj_out, ControlNet zero-convs).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = "SAME"
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel_init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        kernel = self.param(
            "kernel", kernel_init, (k, k, x.shape[-1], self.features), jnp.float32
        )
        if (_PALLAS_CONV or _PALLAS_CONV_VAE) and k == 3 \
                and self.stride == 1 and self.use_bias \
                and pad in ("SAME", [(1, 1), (1, 1)]):
            from fgdm_tpu.kernels.conv import (conv3x3, conv3x3_ok,
                                               conv3x3_vae_ok)

            xk = x.astype(self.dtype)
            if ((_PALLAS_CONV and conv3x3_ok(xk.shape, kernel.shape,
                                             xk.dtype))
                    or (_PALLAS_CONV_VAE and conv3x3_vae_ok(
                        xk.shape, kernel.shape, xk.dtype))):
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                return conv3x3(xk, kernel.astype(self.dtype), bias)
        if _WINOGRAD_CONV and k == 3 and self.stride == 1 and self.use_bias \
                and pad in ("SAME", [(1, 1), (1, 1)]):
            from fgdm_tpu.kernels.winograd import (conv3x3_winograd,
                                                   winograd_ok)

            xk = x.astype(self.dtype)
            if winograd_ok(xk.shape, kernel.shape):
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                return conv3x3_winograd(xk, kernel.astype(self.dtype), bias)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """Linear layer with float32 params, compute in ``dtype``."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", kernel_init, (x.shape[-1], self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
