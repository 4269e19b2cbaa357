"""First-stage VAE (AutoencoderKL) — NHWC flax, SD-1.x compatible.

Mirrors `/root/reference/ldm/modules/diffusionmodules/model.py` (Encoder
`:368-460`, Decoder `:462-570`, ResnetBlock `:82-142`, AttnBlock `:150-213`)
and `/root/reference/ldm/models/autoencoder.py:285-424` (AutoencoderKL with
quant/post_quant 1×1 convs and DiagonalGaussianDistribution), plus the
N-group channel-chunked variant `NpleAutoencoderKL` (`autoencoder.py:426-483`)
used for joint factor latents.

Numerics notes: all GroupNorms use eps 1e-6 ("Normalize", `model.py:35-37`);
the torch Downsample pads asymmetrically (0,1,0,1) before a stride-2 VALID
conv (`model.py:60-77`) — reproduced exactly so checkpoints match.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d, GroupNorm32, nearest_upsample_2x

Dtype = Any


def _make_sh(seq_axis):
    """Per-junction H-shard pin for context parallelism (no-op otherwise);
    the shared helper lives in parallel/ring_attention (lazy import keeps
    module load light)."""
    from fgdm_tpu.parallel.ring_attention import make_sh

    return make_sh(seq_axis)


def swish(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


class VaeResnetBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    fused_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fgdm_tpu.nn.layers import FusedGroupNormSiLU

        out_ch = self.out_channels or self.in_channels

        def norm_act(h, name):
            if self.fused_norm:
                return FusedGroupNormSiLU(eps=1e-6, name=name)(h)
            return swish(GroupNorm32(eps=1e-6, name=name)(h))

        h = norm_act(x, "norm1")
        h = Conv2d(out_ch, kernel_size=3, dtype=self.dtype, name="conv1")(h)
        h = norm_act(h, "norm2")
        h = Conv2d(out_ch, kernel_size=3, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = Conv2d(out_ch, kernel_size=3, dtype=self.dtype,
                           name="conv_shortcut")(x)
            else:
                x = Conv2d(out_ch, kernel_size=1, padding=0, dtype=self.dtype,
                           name="nin_shortcut")(x)
        return x + h


class VaeAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1×1-conv projections."""

    in_channels: int
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None  # context parallelism (parallel/context)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = Conv2d(c, kernel_size=1, padding=0, dtype=self.dtype, name="q")(h)
        k = Conv2d(c, kernel_size=1, padding=0, dtype=self.dtype, name="k")(h)
        v = Conv2d(c, kernel_size=1, padding=0, dtype=self.dtype, name="v")(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        if self.seq_axis is not None:
            from fgdm_tpu.parallel.ring_attention import context_ring_attention

            h = context_ring_attention(
                q[:, None].astype(jnp.float32),
                k[:, None].astype(jnp.float32),
                v[:, None].astype(jnp.float32),
                c ** -0.5, self.seq_axis)[:, 0].astype(v.dtype)
            h = h.reshape(b, hh, ww, c)
        else:
            # Fused single-head attention in the compute dtype (scores and
            # softmax accumulate in f32 on every path).  On TPU at the 512²
            # decode's N=4096/d=512 this routes to the KV-streaming flash
            # kernel (kernels/attention.py:_flash_attention_kv) — every
            # XLA materialized-score variant measures 3-4 TF/s standalone
            # at that shape (tools/probe_vae_attn.py) and the whole-KV
            # flash kernel exceeds VMEM.  Off-TPU this is the same
            # f32-softmax einsum math as before (_xla_attention).
            from fgdm_tpu.kernels.attention import multihead_attention

            h = multihead_attention(
                q[:, None], k[:, None], v[:, None], scale=c ** -0.5,
            )[:, 0].astype(v.dtype).reshape(b, hh, ww, c)
        h = Conv2d(c, kernel_size=1, padding=0, dtype=self.dtype, name="proj_out")(h)
        return x + h


class VaeDownsample(nn.Module):
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            # torch: F.pad(x, (0,1,0,1)) then stride-2 VALID conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return Conv2d(x.shape[-1], kernel_size=3, stride=2, padding="VALID",
                          dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), (2, 2))


class VaeUpsample(nn.Module):
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_2x(x)
        if self.with_conv:
            x = Conv2d(x.shape[-1], kernel_size=3, dtype=self.dtype, name="conv")(x)
        return x


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    fused_norm: bool = False
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None  # context parallelism (parallel/context)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sh = _make_sh(self.seq_axis)
        num_resolutions = len(self.ch_mult)
        curr_res = self.resolution
        in_ch_mult = (1,) + tuple(self.ch_mult)
        h = sh(Conv2d(self.ch, kernel_size=3, dtype=self.dtype, name="conv_in")(x))
        for i_level in range(num_resolutions):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = sh(VaeResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    fused_norm=self.fused_norm,
                    dtype=self.dtype, name=f"down_{i_level}_block_{i_block}",
                )(h))
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = sh(VaeAttnBlock(block_in, dtype=self.dtype, seq_axis=self.seq_axis,
                                        name=f"down_{i_level}_attn_{i_block}")(h))
            if i_level != num_resolutions - 1:
                h = sh(VaeDownsample(dtype=self.dtype,
                                     name=f"down_{i_level}_downsample")(h))
                curr_res //= 2
        h = sh(VaeResnetBlock(in_channels=block_in, fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_block_1")(h))
        h = sh(VaeAttnBlock(block_in, dtype=self.dtype,
                            seq_axis=self.seq_axis, name="mid_attn_1")(h))
        h = sh(VaeResnetBlock(in_channels=block_in, fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_block_2")(h))
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv2d(out_ch, kernel_size=3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 4
    tanh_out: bool = False
    fused_norm: bool = False
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None  # context parallelism (parallel/context)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        sh = _make_sh(self.seq_axis)
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)
        h = sh(Conv2d(block_in, kernel_size=3, dtype=self.dtype, name="conv_in")(z))
        h = sh(VaeResnetBlock(in_channels=block_in, fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_block_1")(h))
        h = sh(VaeAttnBlock(block_in, dtype=self.dtype,
                            seq_axis=self.seq_axis, name="mid_attn_1")(h))
        h = sh(VaeResnetBlock(in_channels=block_in, fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_block_2")(h))
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = sh(VaeResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    fused_norm=self.fused_norm,
                    dtype=self.dtype, name=f"up_{i_level}_block_{i_block}",
                )(h))
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = sh(VaeAttnBlock(block_in, dtype=self.dtype, seq_axis=self.seq_axis,
                                        name=f"up_{i_level}_attn_{i_block}")(h))
            if i_level != 0:
                h = sh(VaeUpsample(dtype=self.dtype,
                                   name=f"up_{i_level}_upsample")(h))
                curr_res *= 2
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = swish(h)
        h = Conv2d(self.out_ch, kernel_size=3, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


@dataclasses.dataclass
class DiagonalGaussian:
    """Diagonal Gaussian over latents (reference `distributions.py:24-62`).

    ``moments`` is the encoder output with mean/logvar channel-concatenated.
    """

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @staticmethod
    def from_moments(moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    def sample(self, rng) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKL(nn.Module):
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    fused_norm: bool = False
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None  # context parallelism (parallel/context)

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, in_channels=self.in_channels,
            resolution=self.resolution, z_channels=self.z_channels,
            double_z=self.double_z, fused_norm=self.fused_norm,
            dtype=self.dtype, seq_axis=self.seq_axis,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
            resolution=self.resolution, z_channels=self.z_channels,
            fused_norm=self.fused_norm, dtype=self.dtype,
            seq_axis=self.seq_axis,
        )
        self.quant_conv = Conv2d(2 * self.embed_dim, kernel_size=1, padding=0,
                                 dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv2d(self.z_channels, kernel_size=1, padding=0,
                                      dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng=None, sample_posterior: bool = True):
        posterior = self.encode(x)
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z), posterior


class NpleAutoencoderKL(AutoencoderKL):
    """Encodes/decodes N latent groups by channel-chunking the latent
    (reference `autoencoder.py:426-483`) — used for joint factor latents
    where e.g. an 8-channel latent is two stacked 4-channel factors."""

    nple: int = 2

    def encode_nple(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        zs = [self.encode(x).mode() for x in xs]
        return jnp.concatenate(zs, axis=-1)

    def decode_nple(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        chunks = jnp.split(z, self.nple, axis=-1)
        return tuple(self.decode(c) for c in chunks)
