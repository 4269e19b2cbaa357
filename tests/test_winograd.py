"""Winograd F(2×2,3×3) conv: parity with the direct convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.kernels.winograd import conv3x3_winograd, winograd_ok


def _ref(x, w, b):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.astype(jnp.float32)[None, None, None, :]


@pytest.mark.parametrize("h,w_len,c,co", [
    (16, 16, 64, 64),
    (8, 8, 128, 64),      # small even
    (15, 17, 64, 128),    # odd sizes exercise the crop path
    (32, 32, 320, 320),   # UNet hot shape
])
def test_winograd_matches_direct_f32(np_rng, h, w_len, c, co):
    x = jnp.asarray(np_rng.standard_normal((2, h, w_len, c)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.standard_normal((co,)), jnp.float32)
    assert winograd_ok(x.shape, w.shape)
    out = conv3x3_winograd(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def test_winograd_bf16_close(np_rng):
    """bf16 path: Winograd loses ~1 bit vs direct (known property) — bound
    the relative error, don't demand bit equality."""
    x = jnp.asarray(np_rng.standard_normal((2, 16, 16, 128)), jnp.bfloat16)
    w = jnp.asarray(np_rng.standard_normal((3, 3, 128, 128)) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((128,), jnp.bfloat16)
    out = np.asarray(conv3x3_winograd(x, w, b), np.float32)
    ref = np.asarray(_ref(x, w, b), np.float32)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.03


def test_winograd_gates():
    assert not winograd_ok((1, 8, 8, 32), (3, 3, 32, 32))    # too narrow
    assert not winograd_ok((1, 8, 8, 64), (1, 1, 64, 64))    # not 3x3
    assert winograd_ok((1, 64, 64, 320), (3, 3, 320, 320))


def test_winograd_dispatch_in_conv2d(np_rng, monkeypatch):
    """FGDM_WINOGRAD_CONV=1 routes Conv2d's 3×3 stride-1 convs through the
    Winograd path."""
    import fgdm_tpu.nn.layers as nl

    monkeypatch.setattr(nl, "_WINOGRAD_CONV", True)
    conv = nl.Conv2d(64, kernel_size=3, dtype=jnp.float32)
    x = jnp.asarray(np_rng.standard_normal((1, 12, 12, 64)), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    out = conv.apply(params, x)
    monkeypatch.setattr(nl, "_WINOGRAD_CONV", False)
    ref = conv.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
