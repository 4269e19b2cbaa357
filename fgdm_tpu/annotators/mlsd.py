"""MLSD line-segment annotator (MobileNetV2 + TypeA/B/C head).

Mirrors `/root/reference/controlnet/annotator/mlsd/`:
``MobileV2_MLSD_Large`` (`models/mbv2_mlsd_large.py:247-300`) — truncated
MobileNetV2 on a 4-channel input (image + ones plane), FPN taps at features
[1,3,6,10,13], BlockTypeA (lateral concat + 2× upsample) / BlockTypeB
(residual 3×3) / BlockTypeC (dilated head) decode to a 16-ch map sliced to
9 channels (center + 4 start/end displacements + 4 aux), and the
``pred_lines`` decode (`utils.py:19-87`): sigmoid center heat → 5×5 nms →
top-k junctions → displacement endpoints, score/length thresholds, lines
drawn at 2× (256→512 grid).

BatchNorms are frozen (inference).  The heat/displacement net runs jitted;
the top-k/threshold decode is host-side numpy like the reference.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fgdm_tpu.annotators.uniformer import FrozenBatchNorm
from fgdm_tpu.nn.layers import Conv2d

Dtype = Any


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # TFLite-style: stride-2 convs pad (0,1,0,1) then VALID
        # (mbv2_mlsd_large.py:112-117)
        if self.stride == 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = 0 if self.stride == 2 else (self.kernel - 1) // 2
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel, self.kernel, in_ch // self.groups, self.features),
            jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            (self.stride, self.stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        y = FrozenBatchNorm(name="bn")(y).astype(jnp.float32)
        return relu6(y)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.out_channels
        h = x
        if self.expand_ratio != 1:
            h = ConvBNReLU(hidden, kernel=1, dtype=self.dtype, name="expand")(h)
        h = ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden,
                       dtype=self.dtype, name="depthwise")(h)
        h = Conv2d(self.out_channels, kernel_size=1, padding=0,
                   use_bias=False, dtype=self.dtype, name="project")(h)
        h = FrozenBatchNorm(name="project_bn")(h).astype(jnp.float32)
        return x + h if use_res else h


class MLSDBackbone(nn.Module):
    """Truncated MobileNetV2 (settings [1,16,1,1],[6,24,2,2],[6,32,3,2],
    [6,64,4,2],[6,96,3,1]; taps at feature indices 1,3,6,10,13)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = {1, 3, 6, 10, 13}
        outs: List[jnp.ndarray] = []
        h = ConvBNReLU(32, stride=2, dtype=self.dtype, name="features_0")(x)
        idx = 1
        settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                    (6, 64, 4, 2), (6, 96, 3, 1)]
        for t, c, n, s in settings:
            for i in range(n):
                h = InvertedResidual(c, s if i == 0 else 1, t,
                                     dtype=self.dtype,
                                     name=f"features_{idx}")(h)
                if idx in taps:
                    outs.append(h)
                idx += 1
        return tuple(outs)  # c1..c5


class BlockTypeA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        def cbr(x, c, name):
            x = Conv2d(c, kernel_size=1, padding=0, use_bias=True,
                       dtype=self.dtype, name=f"{name}_conv")(x)
            return jax.nn.relu(FrozenBatchNorm(name=f"{name}_bn")(x))

        b = cbr(b, self.out_c2, "conv1")
        a = cbr(a, self.out_c1, "conv2")
        if self.upscale:
            bb, hh, ww, cc = b.shape
            b = jax.image.resize(b, (bb, hh * 2, ww * 2, cc), "bilinear")
        return jnp.concatenate([a, b], axis=-1)


class BlockTypeB(nn.Module):
    out_c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = Conv2d(in_c, 3, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(name="bn1")(h))
        x = h + x
        x = Conv2d(self.out_c, 3, dtype=self.dtype, name="conv2")(x)
        return jax.nn.relu(FrozenBatchNorm(name="bn2")(x))


class BlockTypeC(nn.Module):
    out_c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        k = self.param("conv1_kernel",
                       nn.initializers.variance_scaling(
                           2.0, "fan_out", "normal"),
                       (3, 3, in_c, in_c), jnp.float32)
        kb = self.param("conv1_bias", nn.initializers.zeros, (in_c,),
                        jnp.float32)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype), (1, 1),
            [(5, 5), (5, 5)], rhs_dilation=(5, 5),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + kb.astype(x.dtype)  # reference nn.Conv2d default bias=True
        x = jax.nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = Conv2d(in_c, 3, dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(FrozenBatchNorm(name="bn2")(x))
        return Conv2d(self.out_c, 1, padding=0, dtype=self.dtype,
                      name="conv3")(x)


class MobileV2MLSDLarge(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B,H,W,4] → tpMap [B,H/2,W/2,9]."""
        c1, c2, c3, c4, c5 = MLSDBackbone(dtype=self.dtype, name="backbone")(x)
        h = BlockTypeA(64, 64, upscale=False, dtype=self.dtype,
                       name="block15")(c4, c5)
        h = BlockTypeB(64, dtype=self.dtype, name="block16")(h)
        h = BlockTypeA(64, 64, dtype=self.dtype, name="block17")(c3, h)
        h = BlockTypeB(64, dtype=self.dtype, name="block18")(h)
        h = BlockTypeA(64, 64, dtype=self.dtype, name="block19")(c2, h)
        h = BlockTypeB(64, dtype=self.dtype, name="block20")(h)
        h = BlockTypeA(64, 64, dtype=self.dtype, name="block21")(c1, h)
        h = BlockTypeB(64, dtype=self.dtype, name="block22")(h)
        h = BlockTypeC(16, dtype=self.dtype, name="block23")(h)
        return h[..., 7:]


def decode_lines(tp_map: np.ndarray, score_thr: float = 0.10,
                 dist_thr: float = 20.0, topk: int = 200,
                 ksize: int = 3) -> np.ndarray:
    """tpMap [H,W,9] → [N,4] line segments at the 2× grid (utils.py:19-87)."""
    center = tp_map[..., 0]
    disp = tp_map[..., 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    # nms: keep local maxima in a ksize window
    from scipy.ndimage import maximum_filter  # scipy ships with jax stack

    hmax = maximum_filter(heat, size=ksize, mode="constant")
    heat = np.where(hmax == heat, heat, 0.0)
    flat = heat.ravel()
    idx = np.argsort(flat)[::-1][:topk]
    ys, xs = np.unravel_index(idx, heat.shape)
    scores = flat[idx]

    dist = np.sqrt(((disp[..., :2] - disp[..., 2:]) ** 2).sum(-1))
    segs = []
    for y, x, s in zip(ys, xs, scores):
        if s > score_thr and dist[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = disp[y, x]
            segs.append([x + dx0, y + dy0, x + dx1, y + dy1])
    if not segs:
        return np.zeros((0, 4), np.float32)
    return 2.0 * np.asarray(segs, np.float32)


class MLSDdetector:
    """uint8 HWC image → white-on-black line map (reference contract,
    mlsd/__init__.py:21-44)."""

    def __init__(self, params, model: MobileV2MLSDLarge | None = None,
                 input_size: int = 512):
        self.model = model or MobileV2MLSDLarge()
        self.params = params
        self.input_size = input_size
        self._jit = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, img: np.ndarray, thr_v: float = 0.1,
                 thr_d: float = 20.0) -> np.ndarray:
        import cv2

        h, w = img.shape[:2]
        S = self.input_size
        resized = cv2.resize(img, (S, S), interpolation=cv2.INTER_AREA)
        x = np.concatenate([resized, np.ones((S, S, 1))], axis=-1)
        x = x.astype(np.float32) / 127.5 - 1.0
        tp = np.asarray(self._jit(self.params, x[None]))[0]
        lines = decode_lines(tp, thr_v, thr_d)
        out = np.zeros((h, w), np.uint8)
        for x0, y0, x1, y1 in lines:
            cv2.line(out, (int(x0 * w / S), int(y0 * h / S)),
                     (int(x1 * w / S), int(y1 * h / S)), 255, 1)
        return out
