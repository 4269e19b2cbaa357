"""Fused GroupNorm+SiLU kernel tests (interpret mode = exact oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fgdm_tpu.kernels.groupnorm as gn


@pytest.mark.parametrize("shape", [(2, 8, 8, 320), (1, 32, 32, 640),
                                   (3, 4, 4, 1280)])
def test_fused_matches_xla_interpret(shape, monkeypatch, np_rng):
    monkeypatch.setattr(gn, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal(shape), jnp.float32)
    s = jnp.asarray(np_rng.standard_normal(shape[-1]), jnp.float32)
    b = jnp.asarray(np_rng.standard_normal(shape[-1]), jnp.float32)
    ref = gn._xla_group_norm(x, s, b, 32, 1e-5, True)
    out = gn.group_norm_silu(x, s, b, use_fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_without_silu(monkeypatch, np_rng):
    monkeypatch.setattr(gn, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((1, 16, 16, 256)), jnp.float32)
    s = jnp.ones(256)
    b = jnp.zeros(256)
    out = gn.group_norm_silu(x, s, b, apply_silu=False, use_fused=True)
    # normalized output: zero mean/unit var per group
    g = np.asarray(out, np.float64).reshape(1, -1, 32, 8)
    np.testing.assert_allclose(g.mean((1, 3)), 0, atol=1e-4)
    np.testing.assert_allclose(g.var((1, 3)), 1, atol=1e-3)


def test_forced_fused_indivisible_spatial_fails_loud(monkeypatch):
    """use_fused=True with a spatial size no chunk divides must raise, not
    silently drop trailing rows from the statistics (advisor r2)."""
    monkeypatch.setattr(gn, "_INTERPRET", True)
    monkeypatch.setattr(gn, "_NATIVE_4D", False)
    # spatial = 3*343 = 1029: _pick_chunk bottoms out at ck=8, 1029 % 8 != 0
    x = jnp.ones((1, 3, 343, 64), jnp.float32)
    s = jnp.ones(64)
    b = jnp.zeros(64)
    assert gn._pick_chunk(1029, 64) == 8  # the guard's precondition
    with pytest.raises(AssertionError, match="divisible"):
        gn.group_norm_silu(x, s, b, num_groups=8, use_fused=True)


def test_dispatch_gating():
    """Oversized / misaligned inputs fall back to XLA (no crash)."""
    x = jnp.zeros((1, 512, 512, 128))  # no TPU/interpret here → fallback
    out = gn.group_norm_silu(x, jnp.ones(128), jnp.zeros(128))
    assert out.shape == x.shape
    x2 = jnp.zeros((1, 4, 4, 48))      # c < 128 → fallback
    out2 = gn.group_norm_silu(x2, jnp.ones(48), jnp.zeros(48), num_groups=16)
    assert out2.shape == x2.shape


def test_pick_chunk_respects_vmem_budget():
    """Wide skip-concat activations (c=1920) must shrink the row chunk:
    1024x1920 blocks blew the 16MB scoped-vmem limit at batch 16
    (observed compile OOM on v5e)."""
    ck = gn._pick_chunk(1024, 1920)
    assert ck * 1920 <= gn._CHUNK_ELEMS
    assert 1024 % ck == 0
    # narrow channels keep the full chunk
    assert gn._pick_chunk(1024, 320) == min(gn._ROW_CHUNK, 1024)
    # odd spatial sizes still divide evenly
    ck2 = gn._pick_chunk(1000, 1920)
    assert 1000 % ck2 == 0


def test_fused_wide_channels_parity(monkeypatch, np_rng):
    """c=1920 path (chunk-shrunk) matches the XLA reference math."""
    monkeypatch.setattr(gn, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((1, 8, 32, 1920)), jnp.float32)
    s = jnp.asarray(np_rng.standard_normal(1920), jnp.float32)
    b = jnp.asarray(np_rng.standard_normal(1920), jnp.float32)
    ref = gn._xla_group_norm(x, s, b, 32, 1e-5, True)
    out = gn.group_norm_silu(x, s, b, use_fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_4d_odd_height(monkeypatch, np_rng):
    """4D path chunks over H and must handle non-power-of-2 heights."""
    monkeypatch.setattr(gn, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((2, 12, 8, 128)), jnp.float32)
    s = jnp.asarray(np_rng.standard_normal(128), jnp.float32)
    b = jnp.asarray(np_rng.standard_normal(128), jnp.float32)
    ref = gn._xla_group_norm(x, s, b, 32, 1e-5, True)
    out = gn.group_norm_silu(x, s, b, use_fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_3d_input(monkeypatch, np_rng):
    """[B, N, C] transformer-style inputs still work via the flatten path."""
    monkeypatch.setattr(gn, "_INTERPRET", True)
    x = jnp.asarray(np_rng.standard_normal((2, 256, 256)), jnp.float32)
    s = jnp.ones(256)
    b = jnp.zeros(256)
    ref = gn._xla_group_norm(x, s, b, 32, 1e-5, False)
    out = gn.group_norm_silu(x, s, b, apply_silu=False, use_fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
