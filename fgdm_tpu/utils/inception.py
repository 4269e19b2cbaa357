"""InceptionV3 FID feature backend (pool3, 2048-d), pure JAX.

The reference evaluates FID offline with clean-fid (SURVEY §4), whose
standard backend is the TF-Inception "FID variant" of torchvision's
InceptionV3 (pytorch-fid's ``FIDInception*`` blocks): branch average pools
use ``count_include_pad=False`` and the last InceptionE block (Mixed_7c)
uses a **max** pool in its pool branch.  This module implements that exact
variant functionally over a flat parameter dict keyed by the torch
state-dict names, so :func:`ingest_inception` is a direct weight transpose
— point it at the released ``pt_inception-2015-12-21`` (pytorch-fid) or
torchvision ``inception_v3`` checkpoint.

Inference-only: BatchNorm folds running statistics (eps 1e-3), no aux head,
no fc.  Input: [N,H,W,3] in [0,1]; internally resized to 299² bilinear and
scaled to [-1,1] (pytorch-fid preprocessing).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "inception_feature_fn",
    "ingest_inception",
    "expected_inception_keys",
    "init_inception_params",
]

_BN_EPS = 1e-3


def _conv(x, w, stride=1, padding=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _basic_conv(params, name, x, stride=1, padding=((0, 0), (0, 0))):
    """conv(bias=False) → BN(eps=1e-3, running stats) → ReLU."""
    x = _conv(x, params[f"{name}.conv.weight"], stride, padding)
    g = params[f"{name}.bn.weight"]
    b = params[f"{name}.bn.bias"]
    m = params[f"{name}.bn.running_mean"]
    v = params[f"{name}.bn.running_var"]
    inv = g * jax.lax.rsqrt(v + _BN_EPS)
    return jax.nn.relu(x * inv + (b - m * inv))


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool_fid(x, window=3, stride=1, pad=1):
    """Average pool with count_include_pad=False (the FID-variant pooling,
    pytorch-fid FIDInceptionA/C/E_1)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return s / cnt


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
# asymmetric 1×7 / 7×1 paddings: ((top,bottom),(left,right))
_P_17 = ((0, 0), (3, 3))
_P_71 = ((3, 3), (0, 0))


def _inception_a(p, n, x):
    b1 = _basic_conv(p, f"{n}.branch1x1", x)
    b5 = _basic_conv(p, f"{n}.branch5x5_1", x)
    b5 = _basic_conv(p, f"{n}.branch5x5_2", b5, padding=((2, 2), (2, 2)))
    b3 = _basic_conv(p, f"{n}.branch3x3dbl_1", x)
    b3 = _basic_conv(p, f"{n}.branch3x3dbl_2", b3, padding=_P1)
    b3 = _basic_conv(p, f"{n}.branch3x3dbl_3", b3, padding=_P1)
    bp = _basic_conv(p, f"{n}.branch_pool", _avg_pool_fid(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, n, x):
    b3 = _basic_conv(p, f"{n}.branch3x3", x, stride=2)
    bd = _basic_conv(p, f"{n}.branch3x3dbl_1", x)
    bd = _basic_conv(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = _basic_conv(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(p, n, x):
    b1 = _basic_conv(p, f"{n}.branch1x1", x)
    b7 = _basic_conv(p, f"{n}.branch7x7_1", x)
    b7 = _basic_conv(p, f"{n}.branch7x7_2", b7, padding=_P_17)
    b7 = _basic_conv(p, f"{n}.branch7x7_3", b7, padding=_P_71)
    bd = _basic_conv(p, f"{n}.branch7x7dbl_1", x)
    bd = _basic_conv(p, f"{n}.branch7x7dbl_2", bd, padding=_P_71)
    bd = _basic_conv(p, f"{n}.branch7x7dbl_3", bd, padding=_P_17)
    bd = _basic_conv(p, f"{n}.branch7x7dbl_4", bd, padding=_P_71)
    bd = _basic_conv(p, f"{n}.branch7x7dbl_5", bd, padding=_P_17)
    bp = _basic_conv(p, f"{n}.branch_pool", _avg_pool_fid(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, n, x):
    b3 = _basic_conv(p, f"{n}.branch3x3_1", x)
    b3 = _basic_conv(p, f"{n}.branch3x3_2", b3, stride=2)
    b7 = _basic_conv(p, f"{n}.branch7x7x3_1", x)
    b7 = _basic_conv(p, f"{n}.branch7x7x3_2", b7, padding=_P_17)
    b7 = _basic_conv(p, f"{n}.branch7x7x3_3", b7, padding=_P_71)
    b7 = _basic_conv(p, f"{n}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _inception_e(p, n, x, pool_branch_max: bool):
    b1 = _basic_conv(p, f"{n}.branch1x1", x)
    b3 = _basic_conv(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _basic_conv(p, f"{n}.branch3x3_2a", b3, padding=((0, 0), (1, 1))),
        _basic_conv(p, f"{n}.branch3x3_2b", b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _basic_conv(p, f"{n}.branch3x3dbl_1", x)
    bd = _basic_conv(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = jnp.concatenate([
        _basic_conv(p, f"{n}.branch3x3dbl_3a", bd, padding=((0, 0), (1, 1))),
        _basic_conv(p, f"{n}.branch3x3dbl_3b", bd, padding=((1, 1), (0, 0))),
    ], axis=-1)
    if pool_branch_max:
        # FIDInceptionE_2 (Mixed_7c): max pool, stride 1, pad 1
        pool = _max_pool(x, window=3, stride=1, pad=1)
    else:
        pool = _avg_pool_fid(x)
    bp = _basic_conv(p, f"{n}.branch_pool", pool)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict[str, jnp.ndarray], x: jnp.ndarray
                    ) -> jnp.ndarray:
    """[N,299,299,3] in [-1,1] → [N,2048] pool3 features."""
    p = params
    x = _basic_conv(p, "Conv2d_1a_3x3", x, stride=2)
    x = _basic_conv(p, "Conv2d_2a_3x3", x)
    x = _basic_conv(p, "Conv2d_2b_3x3", x, padding=_P1)
    x = _max_pool(x)
    x = _basic_conv(p, "Conv2d_3b_1x1", x)
    x = _basic_conv(p, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    x = _inception_a(p, "Mixed_5b", x)
    x = _inception_a(p, "Mixed_5c", x)
    x = _inception_a(p, "Mixed_5d", x)
    x = _inception_b(p, "Mixed_6a", x)
    x = _inception_c(p, "Mixed_6b", x)
    x = _inception_c(p, "Mixed_6c", x)
    x = _inception_c(p, "Mixed_6d", x)
    x = _inception_c(p, "Mixed_6e", x)
    x = _inception_d(p, "Mixed_7a", x)
    x = _inception_e(p, "Mixed_7b", x, pool_branch_max=False)
    x = _inception_e(p, "Mixed_7c", x, pool_branch_max=True)
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Parameter schema
# ---------------------------------------------------------------------------

# (name, in_ch, out_ch, kh, kw) for every BasicConv2d in forward order.
def _conv_specs() -> List[Tuple[str, int, int, int, int]]:
    specs: List[Tuple[str, int, int, int, int]] = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]

    def a(n, cin, pf):
        specs.extend([
            (f"{n}.branch1x1", cin, 64, 1, 1),
            (f"{n}.branch5x5_1", cin, 48, 1, 1),
            (f"{n}.branch5x5_2", 48, 64, 5, 5),
            (f"{n}.branch3x3dbl_1", cin, 64, 1, 1),
            (f"{n}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{n}.branch3x3dbl_3", 96, 96, 3, 3),
            (f"{n}.branch_pool", cin, pf, 1, 1),
        ])

    def b(n, cin):
        specs.extend([
            (f"{n}.branch3x3", cin, 384, 3, 3),
            (f"{n}.branch3x3dbl_1", cin, 64, 1, 1),
            (f"{n}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{n}.branch3x3dbl_3", 96, 96, 3, 3),
        ])

    def c(n, cin, c7):
        specs.extend([
            (f"{n}.branch1x1", cin, 192, 1, 1),
            (f"{n}.branch7x7_1", cin, c7, 1, 1),
            (f"{n}.branch7x7_2", c7, c7, 1, 7),
            (f"{n}.branch7x7_3", c7, 192, 7, 1),
            (f"{n}.branch7x7dbl_1", cin, c7, 1, 1),
            (f"{n}.branch7x7dbl_2", c7, c7, 7, 1),
            (f"{n}.branch7x7dbl_3", c7, c7, 1, 7),
            (f"{n}.branch7x7dbl_4", c7, c7, 7, 1),
            (f"{n}.branch7x7dbl_5", c7, 192, 1, 7),
            (f"{n}.branch_pool", cin, 192, 1, 1),
        ])

    def d(n, cin):
        specs.extend([
            (f"{n}.branch3x3_1", cin, 192, 1, 1),
            (f"{n}.branch3x3_2", 192, 320, 3, 3),
            (f"{n}.branch7x7x3_1", cin, 192, 1, 1),
            (f"{n}.branch7x7x3_2", 192, 192, 1, 7),
            (f"{n}.branch7x7x3_3", 192, 192, 7, 1),
            (f"{n}.branch7x7x3_4", 192, 192, 3, 3),
        ])

    def e(n, cin):
        specs.extend([
            (f"{n}.branch1x1", cin, 320, 1, 1),
            (f"{n}.branch3x3_1", cin, 384, 1, 1),
            (f"{n}.branch3x3_2a", 384, 384, 1, 3),
            (f"{n}.branch3x3_2b", 384, 384, 3, 1),
            (f"{n}.branch3x3dbl_1", cin, 448, 1, 1),
            (f"{n}.branch3x3dbl_2", 448, 384, 3, 3),
            (f"{n}.branch3x3dbl_3a", 384, 384, 1, 3),
            (f"{n}.branch3x3dbl_3b", 384, 384, 3, 1),
            (f"{n}.branch_pool", cin, 192, 1, 1),
        ])

    a("Mixed_5b", 192, 32)
    a("Mixed_5c", 256, 64)
    a("Mixed_5d", 288, 64)
    b("Mixed_6a", 288)
    c("Mixed_6b", 768, 128)
    c("Mixed_6c", 768, 160)
    c("Mixed_6d", 768, 160)
    c("Mixed_6e", 768, 192)
    d("Mixed_7a", 768)
    e("Mixed_7b", 1280)
    e("Mixed_7c", 2048)
    return specs


def expected_inception_keys() -> List[str]:
    """Torch state-dict keys the ingester consumes (fc/aux excluded)."""
    keys = []
    for name, *_ in _conv_specs():
        keys.append(f"{name}.conv.weight")
        for s in ("weight", "bias", "running_mean", "running_var"):
            keys.append(f"{name}.bn.{s}")
    return keys


def ingest_inception(state_dict) -> Dict[str, jnp.ndarray]:
    """torchvision/pytorch-fid InceptionV3 state dict → param dict.

    Conv kernels OIHW→HWIO; BN buffers pass through.  fc./AuxLogits. keys
    are ignored (FID uses pool3 only).
    """
    params: Dict[str, jnp.ndarray] = {}
    missing = []
    for key in expected_inception_keys():
        if key not in state_dict:
            missing.append(key)
            continue
        w = np.asarray(state_dict[key], np.float32)
        if key.endswith(".conv.weight"):
            w = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        params[key] = jnp.asarray(w)
    if missing:
        raise KeyError(f"inception ingest: {len(missing)} missing keys, "
                       f"first: {missing[:5]}")
    return params


def init_inception_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random-init params with the exact released shapes (for tests and
    smoke runs when no checkpoint is available)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, jnp.ndarray] = {}
    for name, cin, cout, kh, kw in _conv_specs():
        # He scaling: ReLU halves activation variance per layer; anything
        # smaller decays to a constant feature vector over 94 layers.
        params[f"{name}.conv.weight"] = jnp.asarray(
            rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * cin)))
        params[f"{name}.bn.weight"] = jnp.ones((cout,), jnp.float32)
        params[f"{name}.bn.bias"] = jnp.zeros((cout,), jnp.float32)
        params[f"{name}.bn.running_mean"] = jnp.zeros((cout,), jnp.float32)
        params[f"{name}.bn.running_var"] = jnp.ones((cout,), jnp.float32)
    return params


def inception_feature_fn(params: Dict[str, jnp.ndarray]
                         ) -> Tuple[Callable[[np.ndarray], np.ndarray], int]:
    """FID feature backend: ([N,H,W,3] in [0,1]) → [N,2048].

    Plugs into :func:`fgdm_tpu.utils.fid.compute_fid` like
    :func:`clip_feature_fn`.
    """

    # params as a jit argument — closed-over weights embed as HLO constants
    @jax.jit
    def run(params, img01):
        x = jax.image.resize(
            img01, (img01.shape[0], 299, 299, 3), "bilinear")
        return inception_pool3(params, x * 2.0 - 1.0)

    def fn(img01: np.ndarray) -> np.ndarray:
        return np.asarray(run(params, jnp.asarray(img01, jnp.float32)))

    return fn, 2048
