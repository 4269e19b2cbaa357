"""PiDiNet edge detector with pixel-difference convolutions — XLA-native.

Mirrors `/root/reference/ldm/models/model_edge.py` (carv4 config, dil=24,
sa=True — `:627-645`): 16 PDC blocks in 4 stages (60/120/240/240 ch),
CDCM dilation modules, CSAM attention, MapReduce heads, and the 4→1
classifier init'd to 0.25; output thresholded at 0.5 → {-1, 1} 3-channel
map (`:612-626`).

TPU re-design of the pixel-difference ops (`:270-321`): instead of custom
conv functions, each PDC is expressed as a **kernel transformation** ahead
of one standard convolution — mathematically identical, and XLA sees plain
convs it can tile on the MXU:

* cd: ``w' = w − δ_center·Σw``  (central difference)
* ad: ``w' = w − w[clockwise-rotation]``  (angular difference)
* rd: 3×3 ring scattered to a 5×5 kernel with ±w pairs  (radial difference)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d

Dtype = Any

CARV4 = ("cd", "ad", "rd", "cv") * 4

_AD_PERM = jnp.asarray([3, 0, 1, 6, 4, 2, 7, 8, 5])
_RD_POS = jnp.asarray([0, 2, 4, 10, 14, 20, 22, 24])
_RD_NEG = jnp.asarray([6, 7, 8, 11, 13, 16, 17, 18])


def transform_pdc_kernel(w: jnp.ndarray, pdc: str) -> jnp.ndarray:
    """HWIO 3×3 kernel → effective kernel for the given PDC type."""
    if pdc == "cv":
        return w
    if pdc == "cd":
        s = jnp.sum(w, axis=(0, 1), keepdims=True)
        center = jnp.zeros_like(w).at[1, 1].set(s[0, 0])
        return w - center
    if pdc == "ad":
        flat = w.reshape(9, *w.shape[2:])
        return (flat - flat[_AD_PERM]).reshape(w.shape)
    if pdc == "rd":
        flat = w.reshape(9, *w.shape[2:])
        buf = jnp.zeros((25,) + w.shape[2:], w.dtype)
        buf = buf.at[_RD_POS].set(flat[1:])
        buf = buf.at[_RD_NEG].add(-flat[1:])
        return buf.reshape((5, 5) + w.shape[2:])
    raise ValueError(pdc)


class PDCConv(nn.Module):
    """Depthwise (or dense) conv whose kernel is PDC-transformed."""

    features: int
    pdc: str
    groups: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (3, 3, in_ch // self.groups, self.features), jnp.float32,
        )
        keff = transform_pdc_kernel(k, self.pdc)
        pad = keff.shape[0] // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), keff.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class PDCBlock(nn.Module):
    pdc: str
    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = PDCConv(x.shape[-1], self.pdc, groups=x.shape[-1],
                    dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(y)
        y = Conv2d(self.out_channels, kernel_size=1, padding=0, use_bias=False,
                   dtype=self.dtype, name="conv2")(y)
        if self.stride > 1:
            x = Conv2d(self.out_channels, kernel_size=1, padding=0,
                       dtype=self.dtype, name="shortcut")(x)
        return y + x


class CSAM(nn.Module):
    """Compact spatial attention (model_edge.py:356-376)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = Conv2d(4, kernel_size=1, padding=0, dtype=self.dtype,
                   name="conv1")(y)
        y = Conv2d(1, kernel_size=3, use_bias=False, dtype=self.dtype,
                   name="conv2")(y)
        return x * jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)


class CDCM(nn.Module):
    """Compact dilation conv module (model_edge.py:378-401)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(x)
        x = Conv2d(self.out_channels, kernel_size=1, padding=0,
                   dtype=self.dtype, name="conv1")(x)
        out = 0.0
        for i, d in enumerate((5, 7, 9, 11)):
            k = self.param(
                f"conv2_{i + 1}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (3, 3, self.out_channels, self.out_channels), jnp.float32,
            )
            out = out + jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (1, 1),
                padding=[(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return out


class PiDiNet(nn.Module):
    """carv4/dil=24/sa=True PiDiNet (the shipped sketch annotator)."""

    inplane: int = 60
    dil: int = 24
    sa: bool = True
    pdcs: Sequence[str] = CARV4
    dtype: Dtype = jnp.float32
    binarize: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B,H,W,3] in [-1,1] → edge map [B,H,W,3]."""
        b, H, W, _ = x.shape
        # input passes through unscaled, as in the reference training path
        # (ddpm.py feeds the [-1,1] batch image straight in)
        h = PDCConv(self.inplane, self.pdcs[0], dtype=self.dtype,
                    name="init_block")(x)

        stages = []
        idx = 1
        plan = [(1, 3), (2, 4), (4, 4), (4, 4)]
        for si, (mult, nblocks) in enumerate(plan):
            out_ch = self.inplane * mult
            for bi in range(nblocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = PDCBlock(self.pdcs[idx], out_ch, stride=stride,
                             dtype=self.dtype,
                             name=f"block{si + 1}_{bi + 1}")(h)
                idx += 1
            stages.append(h)

        maps = []
        for i, xi in enumerate(stages):
            y = xi
            if self.dil:
                y = CDCM(self.dil, dtype=self.dtype, name=f"dilations_{i}")(y)
            if self.sa:
                y = CSAM(dtype=self.dtype, name=f"attentions_{i}")(y)
            e = Conv2d(1, kernel_size=1, padding=0, dtype=self.dtype,
                       name=f"conv_reduces_{i}")(y)
            maps.append(jax.image.resize(e, (b, H, W, 1), "bilinear"))

        fused = jnp.concatenate(maps, axis=-1)
        wk = self.param("classifier_kernel",
                        lambda *_: jnp.full((1, 1, 4, 1), 0.25, jnp.float32),
                        (1, 1, 4, 1), jnp.float32)
        bk = self.param("classifier_bias", nn.initializers.zeros, (1,),
                        jnp.float32)
        out = jax.lax.conv_general_dilated(
            fused.astype(jnp.float32), wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bk
        out = jax.nn.sigmoid(out)
        if self.binarize:
            out = (out > 0.5).astype(jnp.float32)
        out = out * 2.0 - 1.0
        return jnp.repeat(out, 3, axis=-1)


def load_pidinet(ckpt_path: str, dtype=jnp.float32) -> "PiDiNet":
    """Strict loader: table5_pidinet torch checkpoint → (model, params).
    Raises on any missing/unexpected key."""
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_pidinet
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    model = PiDiNet(dtype=dtype)
    expect = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    params, missing, unexpected = ingest_pidinet(
        load_torch_state_dict(ckpt_path), expect=expect)
    if missing or unexpected:
        raise ValueError(
            f"PiDiNet ingest from {ckpt_path}: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:3]})")
    return model, jax.tree.map(jnp.asarray, params)
