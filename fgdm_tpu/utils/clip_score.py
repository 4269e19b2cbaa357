"""CLIP similarity scoring (eval metric).

Mirrors `/root/reference/utils/clip_utils.py:12-80` (``CLIP_fx`` feature
extractor + ``CLIPEncoder.get_clip_score``, clean-fid style): images are
resized to 224², CLIP-normalized, encoded by the ViT-L/14 vision tower;
text through the text tower + projection; score = cosine similarity.

The vision tower is a flax module here (the reference relies on the
installed ``clip`` package); weights ingest from an OpenAI/HF CLIP
checkpoint via the generic mappers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fgdm_tpu.models.clip import CLIPEncoderLayer, CLIPTextEncoder
from fgdm_tpu.nn.layers import Conv2d, Dense, LayerNorm32

Dtype = Any

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionEncoder(nn.Module):
    """ViT vision tower (defaults: ViT-L/14) with pooled projection."""

    image_size: int = 224
    patch_size: int = 14
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    proj_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B,224,224,3] CLIP-normalized → [B, proj_dim] features."""
        b = x.shape[0]
        h = Conv2d(self.hidden, self.patch_size, stride=self.patch_size,
                   padding=0, use_bias=False, dtype=self.dtype,
                   name="patch_embed")(x)
        hh, ww = h.shape[1], h.shape[2]
        tokens = h.reshape(b, hh * ww, self.hidden)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden,), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (hh * ww + 1, self.hidden), jnp.float32)
        t = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden)).astype(tokens.dtype),
             tokens], axis=1) + pos.astype(tokens.dtype)
        t = LayerNorm32(name="pre_layernorm")(t)
        no_mask = jnp.zeros((1, 1, t.shape[1], t.shape[1]), jnp.float32)
        for i in range(self.layers):
            t = CLIPEncoderLayer(self.hidden, self.heads, dtype=self.dtype,
                                 name=f"layers_{i}")(t, no_mask)
        pooled = LayerNorm32(name="post_layernorm")(t[:, 0])
        return Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                     name="visual_projection")(pooled)


class CLIPScorer:
    """get_clip_score equivalent: cosine(text, image) in [0, 1]-ish."""

    def __init__(self, vision_params, text_params, text_proj,
                 vision_def: Optional[CLIPVisionEncoder] = None,
                 text_def: Optional[CLIPTextEncoder] = None):
        self.vision_def = vision_def or CLIPVisionEncoder()
        self.text_def = text_def or CLIPTextEncoder()
        self.vision_params = vision_params
        self.text_params = text_params
        self.text_proj = text_proj  # [768, proj_dim]
        # params as jit arguments, not closures: closed-over ViT weights
        # embed as ~300MB of HLO constants (see train_step.py)
        self._encode_image = jax.jit(self._encode_image_fn)
        self._encode_text = jax.jit(self._encode_text_fn)

    def _encode_image_fn(self, params, img01: jnp.ndarray) -> jnp.ndarray:
        b = img01.shape[0]
        x = jax.image.resize(
            img01, (b, self.vision_def.image_size,
                    self.vision_def.image_size, 3), "bicubic")
        x = (x - CLIP_MEAN) / CLIP_STD
        f = self.vision_def.apply(params, x)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def _encode_text_fn(self, params, text_proj,
                        input_ids: jnp.ndarray) -> jnp.ndarray:
        states = self.text_def.apply(params, input_ids)
        # pooled = state at EOT position (argmax of ids == EOT)
        eot = jnp.argmax(
            (input_ids == 49407).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(
            states, eot[:, None, None], axis=1)[:, 0]
        f = pooled @ text_proj
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def score(self, img01: jnp.ndarray, input_ids: jnp.ndarray) -> jnp.ndarray:
        """img01 [B,H,W,3] in [0,1]; input_ids [B,77] → per-sample cos sim."""
        fi = self._encode_image(self.vision_params, img01)
        ft = self._encode_text(self.text_params, self.text_proj, input_ids)
        return jnp.sum(fi * ft, axis=-1)
