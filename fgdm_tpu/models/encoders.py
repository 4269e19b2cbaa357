"""Conditioning-stage encoder zoo.

Mirrors `/root/reference/ldm/modules/encoders/modules.py`:
``ClassEmbedder`` (`:21`), ``BERTEmbedder`` (`:80`, backed by the vendored
x_transformer — here a compact pre-LN transformer with the same interface),
``SpatialRescaler`` (`:106`), ``FrozenClipImageEmbedder`` (`:225`, wraps the
CLIP vision tower), and a trainable ``CLIPEmbedder`` variant (`:165`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.models.clip import CLIPEncoderLayer, CLIPTextEncoder
from fgdm_tpu.nn.layers import Conv2d, LayerNorm32
from fgdm_tpu.utils.clip_score import CLIP_MEAN, CLIP_STD, CLIPVisionEncoder

Dtype = Any


class ClassEmbedder(nn.Module):
    embed_dim: int = 512
    n_classes: int = 1000

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """[B] int labels → [B, 1, embed_dim] context."""
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       param_dtype=jnp.float32, name="embedding")(y)
        return emb[:, None, :]


class BERTEmbedder(nn.Module):
    """Transformer text encoder over a learned byte/BPE vocabulary — the
    non-CLIP conditioning path (reference BERTEmbedder + TransformerWrapper,
    `ldm/modules/x_transformer.py:548`)."""

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.n_embed,
                       param_dtype=jnp.float32, name="token_emb")(input_ids)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.n_embed), jnp.float32)
        x = tok.astype(self.dtype) + pos[None, :n].astype(self.dtype)
        no_mask = jnp.zeros((1, 1, n, n), jnp.float32)
        for i in range(self.n_layer):
            x = CLIPEncoderLayer(self.n_embed, self.num_heads,
                                 dtype=self.dtype, name=f"layers_{i}")(
                x, no_mask)
        return LayerNorm32(name="norm")(x).astype(jnp.float32)


class SpatialRescaler(nn.Module):
    """Multiply-downsample a spatial conditioning map, optional 1×1 remap
    (reference `modules.py:106-134`)."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        method = {"bilinear": "bilinear", "nearest": "nearest",
                  "bicubic": "cubic", "area": "linear"}[self.method]
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, int(h * self.multiplier), int(w * self.multiplier), c),
                method,
            )
        if self.out_channels is not None:
            x = Conv2d(self.out_channels, kernel_size=1, padding=0,
                       use_bias=False, dtype=self.dtype, name="channel_mapper")(x)
        return x


class FrozenClipImageEmbedder(nn.Module):
    """CLIP image features as conditioning (reference `modules.py:225-252`)."""

    image_size: int = 224
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionEncoder(image_size=self.image_size,
                                        dtype=self.dtype)

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img [B,H,W,3] in [-1,1] → [B, proj_dim]."""
        b = img.shape[0]
        x = (img + 1.0) / 2.0
        x = jax.image.resize(x, (b, self.image_size, self.image_size, 3),
                             "bicubic")
        x = (x - CLIP_MEAN) / CLIP_STD
        return self.visual(x)


class TrainableCLIPEmbedder(CLIPTextEncoder):
    """Same tower as FrozenCLIPEmbedder but meant to receive gradients
    (reference `modules.py:165-190`); freezing is an optimizer-partition
    decision in this framework, not a module property."""
