"""Pallas direct-conv kernel: numerics vs lax conv, VJP parity, dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fgdm_tpu.kernels.conv as kc


def _ref(x, w, b):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b[None, None, None, :]


@pytest.mark.parametrize("h,c,co", [(16, 128, 128), (32, 320, 128),
                                    (16, 192, 256),
                                    # wblk > 4M forces bco=128 < co: the
                                    # co-grid + per-block bias path
                                    (16, 640, 640)])
def test_conv3x3_interpret_matches_lax(np_rng, monkeypatch, h, c, co):
    monkeypatch.setattr(kc, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((2, h, h, c)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.standard_normal((co,)), jnp.float32)
    assert kc.conv3x3_ok(x.shape, w.shape, x.dtype)
    out = kc._conv3x3_fwd(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def test_conv3x3_vjp_matches_xla(np_rng):
    x = jnp.asarray(np_rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(np_rng.standard_normal((16,)), jnp.float32)
    g = jnp.asarray(np_rng.standard_normal((2, 8, 8, 16)), jnp.float32)

    # small channels force the XLA forward; the custom VJP must match the
    # autodiff of the reference conv exactly
    _, vjp = jax.vjp(kc.conv3x3, x, w, b)
    dx, dw, db = vjp(g)
    _, rvjp = jax.vjp(lambda x_, w_, b_: _ref(x_, w_, b_), x, w, b)
    rdx, rdw, rdb = rvjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rdw), atol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb), atol=1e-4)


@pytest.mark.parametrize("h,c,co", [
    (128, 128, 128),   # forces s > 1 slabs
    (64, 512, 512),    # VAE mid-block plane: whole-plane at the retried bco
    (96, 256, 128),    # non-power-of-two height, co < c
])
def test_conv3x3_slab_interpret_matches_lax(np_rng, monkeypatch, h, c, co):
    monkeypatch.setattr(kc, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((2, h, h, c)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.standard_normal((co,)), jnp.float32)
    assert kc._pick_slabs(h, h, c, co, 4) is not None
    out = kc._conv3x3_slab_fwd(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def test_conv3x3_vae_gate_is_the_measured_win_family(monkeypatch):
    monkeypatch.setattr(kc, "_on_tpu", lambda: True)
    # UNet backbone shapes stay out (chain A/B: XLA wins there)
    assert not kc.conv3x3_vae_ok((8, 64, 64, 320), (3, 3, 320, 320),
                                 jnp.bfloat16)
    assert not kc.conv3x3_vae_ok((8, 32, 32, 640), (3, 3, 640, 640),
                                 jnp.bfloat16)
    # mid-size decoder planes measured a wash or a loss: out
    assert not kc.conv3x3_vae_ok((4, 256, 256, 512), (3, 3, 512, 256),
                                 jnp.bfloat16)
    assert not kc.conv3x3_vae_ok((4, 64, 64, 512), (3, 3, 512, 512),
                                 jnp.bfloat16)
    assert not kc.conv3x3_vae_ok((4, 512, 512, 256), (3, 3, 256, 128),
                                 jnp.bfloat16)
    # the +67% family: h ≥ 512, 128→128 (decoder level-0 ResBlocks)
    assert kc.conv3x3_vae_ok((4, 512, 512, 128), (3, 3, 128, 128),
                             jnp.bfloat16)
    assert kc.conv3x3_vae_ok((1, 1024, 1024, 128), (3, 3, 128, 128),
                             jnp.bfloat16)


def test_conv3x3_dispatch_gates(monkeypatch):
    # shape gating only — pretend we're on the TPU backend (CPU test host)
    monkeypatch.setattr(kc, "_on_tpu", lambda: True)
    # VAE-scale plane: too big for VMEM residency
    assert not kc.conv3x3_ok((1, 512, 512, 128), (3, 3, 128, 128),
                             jnp.bfloat16)
    # 1x1 conv: out of scope
    assert not kc.conv3x3_ok((1, 64, 64, 320), (1, 1, 320, 320),
                             jnp.bfloat16)
    # UNet hot shapes: covered
    assert kc.conv3x3_ok((8, 64, 64, 320), (3, 3, 320, 320), jnp.bfloat16)
    assert kc.conv3x3_ok((8, 16, 16, 1280), (3, 3, 1280, 1280), jnp.bfloat16)
    assert kc.conv3x3_ok((8, 32, 32, 960), (3, 3, 960, 640), jnp.bfloat16)
