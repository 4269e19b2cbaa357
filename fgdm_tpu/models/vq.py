"""VQ-GAN first stage (taming-transformers style).

Mirrors `/root/reference/ldm/models/autoencoder.py:14-283` (``VQModel`` /
``VQModelInterface``): the same conv Encoder/Decoder as the KL VAE plus a
vector-quantization bottleneck — nearest-codebook lookup with the
straight-through estimator and the commitment/codebook ("embedding") loss.
``VQModelInterface`` exposes encode-without-quantize / quantize-at-decode,
the variant LatentDiffusion uses.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.models.autoencoder import Decoder, Encoder
from fgdm_tpu.nn.layers import Conv2d

Dtype = Any


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook with straight-through gradients."""

    n_embed: int = 16384
    embed_dim: int = 4
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim), jnp.float32,
        )
        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, self.embed_dim)
        # ||z - e||² = ||z||² + ||e||² − 2 z·e
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None]
            - 2.0 * flat @ codebook.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(zf.shape)
        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2) \
            + jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2)
        z_q = zf + jax.lax.stop_gradient(z_q - zf)  # straight-through
        return z_q.astype(z.dtype), loss, idx.reshape(zf.shape[:-1])

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        codebook = self.get_variable("params", "embedding")
        return codebook[indices]


class VQModel(nn.Module):
    n_embed: int = 16384
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 4
    beta: float = 0.25
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            in_channels=self.in_channels, resolution=self.resolution,
            z_channels=self.z_channels, double_z=False, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
            resolution=self.resolution, z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim,
                                        self.beta)
        self.quant_conv = Conv2d(self.embed_dim, kernel_size=1, padding=0,
                                 dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv2d(self.z_channels, kernel_size=1,
                                      padding=0, dtype=self.dtype,
                                      name="post_quant_conv")

    def encode(self, x):
        h = self.quant_conv(self.encoder(x))
        return self.quantize(h)  # (z_q, emb_loss, indices)

    def encode_pre_quant(self, x):
        """VQModelInterface.encode: return continuous latents
        (autoencoder.py:242-246)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q))

    def decode_pre_quant(self, h, force_not_quantize: bool = False):
        """VQModelInterface.decode: quantize-then-decode
        (autoencoder.py:248-258)."""
        if force_not_quantize:
            return self.decode(h)
        z_q, _, _ = self.quantize(h)
        return self.decode(z_q)

    def __call__(self, x):
        z_q, emb_loss, _ = self.encode(x)
        return self.decode(z_q), emb_loss
