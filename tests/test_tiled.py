"""Tiled inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.sampling.tiled import _smooth_window, _tile_starts, tiled_apply


def test_tile_starts_cover():
    starts = _tile_starts(100, 40, 30)
    assert starts[0] == 0 and starts[-1] == 60
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s:s + 40] = True
    assert covered.all()


def test_window_positive():
    w = _smooth_window(32)
    assert (w > 0).all() and w[16] > w[0]


def test_tiled_identity():
    """Identity fn through overlapping tiles must reproduce the input."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48, 3))
    out = tiled_apply(lambda t: t, x, tile=32, stride=24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_tiled_upscale():
    """2x-upsampling fn: output is the blended 2x image."""

    def fn(t):
        b, h, w, c = t.shape
        return jnp.broadcast_to(
            t[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, 2 * h, 2 * w, c)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 2))
    out = tiled_apply(fn, x, tile=16, stride=8, out_scale=2)
    assert out.shape == (1, 64, 64, 2)
    ref = fn(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tiled_jit():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 48, 3))

    @jax.jit
    def run(x):
        return tiled_apply(lambda t: t * 2.0, x, tile=16, stride=12)

    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(x) * 2.0,
                               atol=1e-5)
