"""Native (C++) transforms vs numpy reference parity."""

import numpy as np
import pytest

from fgdm_tpu.data import native
from fgdm_tpu.data.colorize import color_map
from fgdm_tpu.data.colorize import colorize as np_colorize
from fgdm_tpu.data.colorize import decolorize as np_decolorize

needs_native = pytest.mark.skipif(not native.HAS_NATIVE,
                                  reason="libfgdm_transforms.so not built")


@needs_native
def test_native_colorize_matches_numpy():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 150, (64, 64)).astype(np.uint8)
    labels[0, :8] = 255  # void
    cmap = color_map(150)
    np.testing.assert_array_equal(native.colorize(labels, cmap),
                                  np_colorize(labels, cmap))


@needs_native
def test_native_decolorize_roundtrip():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 150, (32, 32)).astype(np.uint8)
    cmap = color_map(150)
    rgb = native.colorize(labels, cmap)
    back = native.decolorize(rgb, cmap)
    np.testing.assert_array_equal(back, labels.astype(np.int32))
    np.testing.assert_array_equal(back, np_decolorize(rgb, cmap))


@needs_native
def test_native_resize_and_normalize():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    out = native.resize_u8(img, (64, 64), "bilinear")
    assert out.shape == (64, 64, 3)
    near = native.resize_u8(img, (16, 16), "nearest")
    assert near.shape == (16, 16, 3)
    norm = native.normalize_f32(img)
    np.testing.assert_allclose(norm, img.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)


@needs_native
def test_fused_label_to_tensor():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 20, (48, 48)).astype(np.uint8)
    cmap = color_map(20)
    out = native.label_to_tensor(labels, cmap, (32, 32))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # reference path: colorize → nearest resize → normalize
    ref = native.normalize_f32(
        native.resize_u8(np_colorize(labels, cmap), (32, 32), "nearest"))
    np.testing.assert_allclose(out, ref, atol=1e-6)
