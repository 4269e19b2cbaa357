"""MiDaS DPT-hybrid monocular depth + normal-from-gradient annotator.

Mirrors `/root/reference/controlnet/annotator/midas/__init__.py:13-42`
(``MidasDetector``: depth inference, min-max normalize, Sobel-gradient
normals with background threshold) and the DPT-hybrid architecture under
`controlnet/annotator/midas/midas/` (`dpt_depth.py`, `vit.py`, `blocks.py`):

* ViT-hybrid backbone — ResNetV2-50 stem (weight-standardized convs +
  GroupNorm, stages 3/4/9) whose 1/4 and 1/8 features are tapped directly,
  1/16 features patch-embedded into a 768-d ViT-B (12 layers) with the
  class-token "project" readout; transformer taps at layers 8 and 11.
* Reassemble to [256, 512, 768, 768] pyramids; RefineNet-style fusion with
  residual conv units (features 256); monocular depth head.

The depth→normal conversion (`__init__.py:31-42`) is implemented in-graph:
Sobel gradients, background mask, L2 normalization — so the whole
depth/normal condition synthesis can run inside a fused training step
(the reference shells out to cv2 per batch).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d, Dense, GroupNorm32, LayerNorm32

Dtype = Any


class StdConv(nn.Module):
    """Weight-standardized conv with TF-SAME padding (timm StdConv2dSame —
    the hybrid backbone's conv layer; `vision_transformer_hybrid._resnetv2`
    uses ``partial(StdConv2dSame, eps=1e-8)``).  TF-SAME pads
    asymmetrically for stride>1 on even inputs (e.g. 7×7 s2 pads (2,3)),
    which is what ``jax.lax`` "SAME" implements — symmetric k//2 padding
    would shift every stride-2 feature map by one pixel vs the released
    checkpoint's training geometry."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-8)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class BitBottleneck(nn.Module):
    """Post-norm ResNetV2 bottleneck — timm's ``Bottleneck`` (preact=False),
    which is what ``vit_base_resnet50_384`` actually uses (confirmed by the
    HF DPT-hybrid port: ``DPTConfig`` hybrid defaults pin the converted
    backbone to ``layer_type="bottleneck", global_padding="same"``):
    conv1(1×1)→GN+ReLU → conv2(3×3,stride)→GN+ReLU → conv3(1×1)→GN(no act);
    shortcut = 1×1 StdConv(stride)+GN(no act) on the RAW input when shape
    changes; ReLU after the residual add."""

    mid: int
    out: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out or self.stride != 1:
            shortcut = StdConv(self.out, 1, stride=self.stride,
                               dtype=self.dtype, name="downsample")(x)
            shortcut = GroupNorm32(name="downsample_norm")(shortcut)
        h = StdConv(self.mid, 1, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(GroupNorm32(name="gn1")(h))
        h = StdConv(self.mid, 3, stride=self.stride, dtype=self.dtype,
                    name="conv2")(h)
        h = jax.nn.relu(GroupNorm32(name="gn2")(h))
        h = StdConv(self.out, 1, dtype=self.dtype, name="conv3")(h)
        h = GroupNorm32(name="gn3")(h)
        return jax.nn.relu(h + shortcut)


class ResNetV2Stem(nn.Module):
    """BiT-R50 three-stage backbone (3/4/9 post-norm bottlenecks, TF-SAME
    padding) → taps at 1/4, 1/8, final 1/16 feature for patch embedding.
    Matches timm ``ResNetV2(layers=(3,4,9), preact=False, stem_type='same',
    conv_layer=StdConv2dSame)`` — the 'same' stem is conv7×7 s2 + GN+ReLU +
    MaxPool2dSame(3, s2); no final norm (post-norm blocks carry their
    own)."""

    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w = self.width
        h = StdConv(w, 7, stride=2, dtype=self.dtype, name="conv_stem")(
            x
        )  # 1/2
        h = GroupNorm32(name="gn_stem")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")  # 1/4

        for i in range(3):
            h = BitBottleneck(w, w * 4, dtype=self.dtype,
                              name=f"stage1_{i}")(h)
        f4 = h  # 256 @ 1/4
        for i in range(4):
            h = BitBottleneck(w * 2, w * 8, stride=2 if i == 0 else 1,
                              dtype=self.dtype, name=f"stage2_{i}")(h)
        f8 = h  # 512 @ 1/8
        for i in range(9):
            h = BitBottleneck(w * 4, w * 16, stride=2 if i == 0 else 1,
                              dtype=self.dtype, name=f"stage3_{i}")(h)
        return f4, f8, h  # 1024 @ 1/16


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm32(eps=1e-6, name="norm1")(x)
        b, n, d = h.shape
        dh = self.dim // self.heads
        qkv = Dense(self.dim * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)

        att = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", split(q).astype(jnp.float32),
                       split(k).astype(jnp.float32)) * dh**-0.5, axis=-1
        )
        o = jnp.einsum("bhij,bhjd->bhid", att.astype(v.dtype), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + Dense(self.dim, dtype=self.dtype, name="proj")(o)
        h = LayerNorm32(eps=1e-6, name="norm2")(x)
        h = Dense(self.dim * 4, dtype=self.dtype, name="fc1")(h)
        # exact erf GELU: timm ViT uses torch nn.GELU() (approximate='none');
        # jax.nn.gelu defaults to the tanh approximation
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(h.dtype)
        h = Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = Conv2d(self.features, 3, dtype=self.dtype, name="conv1")(h)
        h = jax.nn.relu(h)
        h = Conv2d(self.features, 3, dtype=self.dtype, name="conv2")(h)
        return x + h


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int
                         ) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics (the DPT
    fusion/head interpolates use it, blocks.py:295,332; dpt_depth.py:94) —
    jax.image.resize only offers half-pixel centers."""
    b, h, w, c = x.shape

    def axis(n_in, n_out):
        if n_out == 1 or n_in == 1:
            z = jnp.zeros((n_out,))
            return z, z.astype(jnp.int32), z.astype(jnp.int32)
        pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        return (pos - lo).astype(x.dtype), lo, hi

    fy, ylo, yhi = axis(h, out_h)
    fx, xlo, xhi = axis(w, out_w)
    rows_lo, rows_hi = x[:, ylo], x[:, yhi]

    def lerp_x(r):
        return (r[:, :, xlo] * (1 - fx)[None, None, :, None]
                + r[:, :, xhi] * fx[None, None, :, None])

    top, bot = lerp_x(rows_lo), lerp_x(rows_hi)
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


class FeatureFusion(nn.Module):
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             name="resConfUnit2")(x)
        b, h, w, c = x.shape
        x = resize_align_corners(x, h * 2, w * 2)
        return Conv2d(self.features, 1, padding=0, dtype=self.dtype,
                      name="out_conv")(x)


class DPTHybrid(nn.Module):
    """DPT-hybrid depth net (ViT-B + R50 stem), features=256."""

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    hooks: Sequence[int] = (8, 11)
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, taps=None) -> jnp.ndarray:
        """x: [B,H,W,3] normalized image → inverse depth [B,H,W].

        ``taps=(f4, f8, tok3, tok4)`` bypasses the stem + ViT blocks and
        feeds the readout/reassemble/fusion/head path directly — the
        injection point right after ``forward_flex`` in the reference
        (`vit.py:56-64`), used by the neck forward-parity oracle
        (tests/test_annotator_oracle.py) since the ViT backbone itself is
        timm-bound."""
        if taps is not None:
            f4, f8, tok3, tok4 = taps
            b = f4.shape[0]
            hh, ww = f8.shape[1] // 2, f8.shape[2] // 2
            vit_taps = [tok3, tok4]
        else:
            b, H, W, _ = x.shape
            f4, f8, f16 = ResNetV2Stem(dtype=self.dtype, name="resnet")(x)

            hh, ww = f16.shape[1], f16.shape[2]
            tokens = Conv2d(self.embed_dim, 1, padding=0, dtype=self.dtype,
                            name="patch_embed")(f16).reshape(b, hh * ww,
                                                             self.embed_dim)
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim), jnp.float32)
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, hh * ww + 1, self.embed_dim), jnp.float32)
            t = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(
                    tokens.dtype), tokens], axis=1)
            t = t + pos.astype(t.dtype)

            vit_taps = []
            for i in range(self.num_layers):
                t = ViTBlock(self.embed_dim, heads=self.num_heads,
                             dtype=self.dtype, name=f"blocks_{i}")(t)
                if i in self.hooks:
                    vit_taps.append(t)

        def readout(tok, name):
            # "project" readout: concat cls token, Linear(2d→d)+GELU
            cls_t = tok[:, :1]
            feats = tok[:, 1:]
            merged = jnp.concatenate(
                [feats, jnp.broadcast_to(cls_t, feats.shape)], axis=-1)
            y = Dense(self.embed_dim, dtype=self.dtype, name=name)(merged)
            # exact erf GELU (reference ProjectReadout uses nn.GELU(),
            # vit.py:36)
            y = jax.nn.gelu(y.astype(jnp.float32),
                            approximate=False).astype(y.dtype)
            return y.reshape(b, hh, ww, self.embed_dim)

        l3 = readout(vit_taps[0], "readout3")
        l4 = readout(vit_taps[1], "readout4")
        # reassemble (vit.py:429-460): each tap gets a 1×1 768→768 conv
        # (act_postprocess{3,4}.3); layer4 additionally downsamples to 1/32
        # with a 3×3 stride-2 conv (act_postprocess4.4)
        l3 = Conv2d(self.embed_dim, 1, padding=0, dtype=self.dtype,
                    name="act_postprocess3_proj")(l3)
        l4 = Conv2d(self.embed_dim, 1, padding=0, dtype=self.dtype,
                    name="act_postprocess4_proj")(l4)
        l4 = Conv2d(self.embed_dim, 3, stride=2, padding=1, dtype=self.dtype,
                    name="act_postprocess4")(l4)

        # scratch projections to the fusion width
        rns = []
        for i, (f, c) in enumerate(
            [(f4, 256), (f8, 512), (l3, 768), (l4, 768)]
        ):
            rns.append(Conv2d(self.features, 3, use_bias=False,
                              dtype=self.dtype, name=f"layer{i + 1}_rn")(f))

        p4 = FeatureFusion(self.features, dtype=self.dtype,
                           name="refinenet4")(rns[3])
        p3 = FeatureFusion(self.features, dtype=self.dtype,
                           name="refinenet3")(p4, rns[2])
        p2 = FeatureFusion(self.features, dtype=self.dtype,
                           name="refinenet2")(p3, rns[1])
        p1 = FeatureFusion(self.features, dtype=self.dtype,
                           name="refinenet1")(p2, rns[0])

        h = Conv2d(self.features // 2, 3, dtype=self.dtype,
                   name="head_conv1")(p1)
        bh, hh2, ww2, c = h.shape
        h = resize_align_corners(h, hh2 * 2, ww2 * 2)
        h = Conv2d(32, 3, dtype=self.dtype, name="head_conv2")(h)
        h = jax.nn.relu(h)
        h = Conv2d(1, 1, padding=0, dtype=self.dtype, name="head_conv3")(h)
        h = jax.nn.relu(h)  # non-negative inverse depth
        return h[..., 0].astype(jnp.float32)


def depth_to_normal(depth: jnp.ndarray, a: float = 2.0 * 3.14159265,
                    bg_th: float = 0.1) -> jnp.ndarray:
    """Normals from depth gradients — in-graph version of the reference's
    cv2.Sobel pipeline (midas/__init__.py:31-42).  depth: [B,H,W]."""
    d = depth[..., None]
    sx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    kx = sx[:, :, None, None]
    ky = sx.T[:, :, None, None]
    gx = jax.lax.conv_general_dilated(
        d, kx, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gy = jax.lax.conv_general_dilated(
        d, ky, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dmin = jnp.min(depth, axis=(1, 2), keepdims=True)
    dmax = jnp.max(depth, axis=(1, 2), keepdims=True)
    dnorm = (depth - dmin) / (dmax - dmin + 1e-8)
    mask = (dnorm >= bg_th)[..., None]
    gx = gx * mask
    gy = gy * mask
    z = jnp.full_like(gx, a)
    n = jnp.concatenate([gx, gy, z], axis=-1)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    return n  # [B,H,W,3] in roughly [-1,1]


class MidasDetector:
    """Functional wrapper: image [B,H,W,3] in [-1,1] → (depth01, normal).

    Equivalent of the reference MidasDetector (depth min-max normalized to
    [0,1]; normal image in [-1,1])."""

    def __init__(self, params, model: DPTHybrid | None = None):
        self.model = model or DPTHybrid()
        self.params = params

    def __call__(self, img: jnp.ndarray, a: float = 2.0 * 3.14159265,
                 bg_th: float = 0.1):
        depth = self.model.apply(self.params, img)
        dmin = jnp.min(depth, axis=(1, 2), keepdims=True)
        dmax = jnp.max(depth, axis=(1, 2), keepdims=True)
        depth01 = (depth - dmin) / (dmax - dmin + 1e-8)
        normal = depth_to_normal(depth, a=a, bg_th=bg_th)
        return depth01, normal


def load_midas(ckpt_path: str, dtype=jnp.float32) -> MidasDetector:
    """Strict loader: dpt_hybrid-midas torch checkpoint → ready
    MidasDetector.  Raises on any missing/unexpected key."""
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_midas
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    model = DPTHybrid(dtype=dtype)
    expect = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3))))
    params, missing, unexpected = ingest_midas(
        load_torch_state_dict(ckpt_path), expect=expect)
    if missing or unexpected:
        raise ValueError(
            f"MiDaS ingest from {ckpt_path}: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:3]})")
    return MidasDetector(jax.tree.map(jnp.asarray, params), model)
