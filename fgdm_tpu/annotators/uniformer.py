"""UniFormer-S + UPerHead semantic segmentation annotator (ADE20K, 150 cls).

Pure-JAX re-implementation of the inference path the reference uses for
seg2image (`/root/reference/controlnet/annotator/uniformer/__init__.py:15-27`
→ vendored mmseg `init_segmentor`/`inference_segmentor` with the
``upernet_global_small`` config: embed dims [64,128,320,512], layers
[3,4,8,3], head_dim 64 — `exp/upernet_global_small/config.py:7-16`).  Only
the encoder-decoder inference path is rebuilt — not the 43k-LoC mmseg zoo;
the mmcv ops it needs (resize, pooling) are `jax.image` equivalents
(SURVEY §2.9's native-boundary note).

Backbone blocks (`mmseg/models/backbones/uniformer.py:24-243`):
* CBlock — depthwise 3×3 pos-embed, BN→1×1→dw5×5→1×1 "conv attention",
  BN→CMlp, residuals (stages 1-2).
* SABlock — dw 3×3 pos-embed, LN→MHSA→LN→MLP on flattened tokens
  (stages 3-4).
* PatchEmbed — 4×4/s4 then 2×2/s2 convs with channel LayerNorm.

Decode head: standard UPerNet (PPM over the last stage with pools 1/2/3/6,
FPN laterals, fused 3×3 conv, 1×1 classifier to 150 classes), channels 512.
BatchNorms are frozen (inference) — affine transform with stored running
statistics.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d, Dense, LayerNorm32

Dtype = Any

# ImageNet normalization used by the mmseg test pipeline
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


class FrozenBatchNorm(nn.Module):
    """Inference-time BatchNorm: y = (x - mean)/sqrt(var+eps)*scale + bias."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x.astype(jnp.float32) - mean) * inv + bias


def dw_conv(x, features, kernel, name, parent, dtype):
    """Depthwise conv helper."""
    k = parent.param(
        f"{name}_kernel",
        nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
        (kernel, kernel, 1, features), jnp.float32,
    )
    b = parent.param(f"{name}_bias", nn.initializers.zeros, (features,),
                     jnp.float32)
    pad = kernel // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=features,
    )
    return y + b.astype(dtype)


class CBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + dw_conv(x, self.dim, 3, "pos_embed", self, self.dtype)
        h = FrozenBatchNorm(name="norm1")(x).astype(x.dtype)
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv1")(h)
        h = dw_conv(h, self.dim, 5, "attn", self, self.dtype)
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv2")(h)
        x = x + h
        h = FrozenBatchNorm(name="norm2")(x).astype(x.dtype)
        h = Conv2d(self.dim * 4, 1, padding=0, dtype=self.dtype,
                   name="mlp_fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(h.dtype)
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class SABlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + dw_conv(x, self.dim, 3, "pos_embed", self, self.dtype)
        b, hh, ww, c = x.shape
        t = x.reshape(b, hh * ww, c)
        h = LayerNorm32(eps=1e-6, name="norm1")(t)
        qkv = Dense(self.dim * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = self.dim // self.num_heads

        def split(z):
            return z.reshape(b, -1, self.num_heads, dh).transpose(0, 2, 1, 3)

        att = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", split(q).astype(jnp.float32),
                       split(k).astype(jnp.float32)) * dh**-0.5, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", att.astype(v.dtype), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        t = t + Dense(self.dim, dtype=self.dtype, name="proj")(o)
        h = LayerNorm32(eps=1e-6, name="norm2")(t)
        h = Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(h.dtype)
        h = Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        t = t + h
        return t.reshape(b, hh, ww, c)


class PatchEmbed(nn.Module):
    embed_dim: int
    patch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.embed_dim, self.patch, stride=self.patch, padding=0,
                   dtype=self.dtype, name="proj")(x)
        return LayerNorm32(name="norm")(x)


class UniFormer(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    layers: Sequence[int] = (3, 4, 8, 3)
    head_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for s, (dim, n) in enumerate(zip(self.embed_dims, self.layers)):
            x = PatchEmbed(dim, 4 if s == 0 else 2, dtype=self.dtype,
                           name=f"patch_embed{s + 1}")(x)
            for i in range(n):
                if s < 2:
                    x = CBlock(dim, dtype=self.dtype,
                               name=f"blocks{s + 1}_{i}")(x)
                else:
                    x = SABlock(dim, dim // self.head_dim, dtype=self.dtype,
                                name=f"blocks{s + 1}_{i}")(x)
            outs.append(LayerNorm32(eps=1e-6, name=f"norm{s + 1}")(x))
        return tuple(outs)


class ConvModule(nn.Module):
    features: int
    kernel: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel,
                   padding=self.kernel // 2, use_bias=False,
                   dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x).astype(jnp.float32)
        return jax.nn.relu(x)


class UPerHead(nn.Module):
    channels: int = 512
    num_classes: int = 150
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        f = list(feats)
        b, h, w, c = f[-1].shape
        # PPM over the last stage
        ppm_outs = [f[-1]]
        for i, s in enumerate(self.pool_scales):
            pooled = jax.image.resize(f[-1], (b, s, s, c), "linear") \
                if False else _adaptive_avg_pool(f[-1], s)
            y = ConvModule(self.channels, dtype=self.dtype,
                           name=f"ppm_{i}")(pooled)
            ppm_outs.append(jax.image.resize(y, (b, h, w, self.channels),
                                             "bilinear"))
        bottleneck = ConvModule(self.channels, kernel=3, dtype=self.dtype,
                                name="bottleneck")(
            jnp.concatenate(ppm_outs, axis=-1))

        # FPN laterals
        laterals = [
            ConvModule(self.channels, dtype=self.dtype,
                       name=f"lateral_{i}")(f[i])
            for i in range(len(f) - 1)
        ] + [bottleneck]
        for i in range(len(laterals) - 1, 0, -1):
            bb, hh, ww, cc = laterals[i - 1].shape
            laterals[i - 1] = laterals[i - 1] + jax.image.resize(
                laterals[i], (bb, hh, ww, cc), "bilinear")
        fpn_outs = [
            ConvModule(self.channels, kernel=3, dtype=self.dtype,
                       name=f"fpn_{i}")(laterals[i])
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        bb, hh, ww, _ = fpn_outs[0].shape
        fpn_outs = [
            jax.image.resize(o, (bb, hh, ww, self.channels), "bilinear")
            for o in fpn_outs
        ]
        fused = ConvModule(self.channels, kernel=3, dtype=self.dtype,
                           name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1))
        return Conv2d(self.num_classes, 1, padding=0, dtype=self.dtype,
                      name="conv_seg")(fused)


def _adaptive_avg_pool(x, out_size: int):
    b, h, w, c = x.shape
    # torch AdaptiveAvgPool semantics via mean over equal bins (h,w are
    # multiples in practice at 512² input; fall back to resize otherwise)
    if h % out_size == 0 and w % out_size == 0:
        return x.reshape(b, out_size, h // out_size, out_size, w // out_size,
                         c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, out_size, out_size, c), "bilinear")


class UniFormerSeg(nn.Module):
    """Full segmentor: backbone + UPerHead, logits at input resolution."""

    num_classes: int = 150
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = UniFormer(dtype=self.dtype, name="backbone")(x)
        logits = UPerHead(num_classes=self.num_classes, dtype=self.dtype,
                          name="decode_head")(feats)
        b, h, w, _ = x.shape
        return jax.image.resize(
            logits.astype(jnp.float32), (b, h, w, self.num_classes),
            "bilinear",
        )


class UniformerDetector:
    """image uint8 HWC (or [B,H,W,3]) → colorized ADE segmentation map,
    mirroring the reference detector's output contract
    (`uniformer/__init__.py:25-27`)."""

    def __init__(self, params, model: UniFormerSeg | None = None,
                 input_size: int = 512):
        self.model = model or UniFormerSeg()
        self.params = params
        self.input_size = input_size
        self._jit_logits = jax.jit(
            lambda p, x: jnp.argmax(self.model.apply(p, x), axis=-1)
        )

    def labels(self, img: np.ndarray) -> np.ndarray:
        """uint8 [B,H,W,3] (or HWC) → ADE label map [B,H,W] int32 (0..149),
        argmax at the model resolution, nearest-resized back."""
        single = img.ndim == 3
        if single:
            img = img[None]
        b, h, w, _ = img.shape
        x = (img.astype(np.float32) - _MEAN) / _STD
        x = jax.image.resize(jnp.asarray(x),
                             (b, self.input_size, self.input_size, 3),
                             "bilinear")
        seg = np.asarray(self._jit_logits(self.params, x))
        seg = np.asarray(
            jax.image.resize(jnp.asarray(seg)[..., None].astype(jnp.float32),
                             (b, h, w, 1), "nearest")
        )[..., 0].astype(np.int32)
        return seg[0] if single else seg

    def __call__(self, img: np.ndarray) -> np.ndarray:
        from fgdm_tpu.data.colorize import ade_cmap, colorize

        seg = self.labels(img)
        rgb = colorize(seg, ade_cmap()[1:])  # ade palette sans background
        return rgb


def load_uniformer(ckpt_path: str, input_size: int = 512,
                   dtype=jnp.float32) -> UniformerDetector:
    """Strict loader: upernet_global_small torch checkpoint → ready
    UniformerDetector.  Raises on any missing/unexpected key — a silently
    part-random segmentor would fake plausible maps."""
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_uniformer
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    model = UniFormerSeg(dtype=dtype)
    expect = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    params, missing, unexpected = ingest_uniformer(
        load_torch_state_dict(ckpt_path), expect=expect)
    if missing or unexpected:
        raise ValueError(
            f"UniFormer ingest from {ckpt_path}: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:3]})")
    return UniformerDetector(jax.tree.map(jnp.asarray, params), model,
                             input_size=input_size)
