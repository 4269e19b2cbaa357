"""Attention kernel parity: flash (interpreted) vs XLA; capture semantics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fgdm_tpu.kernels.attention as ka


def _ref_attention(q, k, v, scale):
    sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
    p = np.exp(sim - sim.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", p, v)


def test_xla_attention_matches_numpy(np_rng):
    q = np_rng.standard_normal((2, 3, 16, 8)).astype(np.float32)
    k = np_rng.standard_normal((2, 3, 24, 8)).astype(np.float32)
    v = np_rng.standard_normal((2, 3, 24, 8)).astype(np.float32)
    scale = 1 / math.sqrt(8)
    out = ka.multihead_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), _ref_attention(q, k, v, scale), atol=1e-5)


def test_flash_attention_interpret_matches_xla(np_rng, monkeypatch):
    monkeypatch.setattr(ka, "_INTERPRET", True)
    q = np_rng.standard_normal((1, 2, 512, 40)).astype(np.float32)
    k = np_rng.standard_normal((1, 2, 512, 40)).astype(np.float32)
    v = np_rng.standard_normal((1, 2, 512, 40)).astype(np.float32)
    scale = 1 / math.sqrt(40)
    ref = ka._xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    out = ka._flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=128, block_k=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_scores_capture_is_head_averaged_presoftmax(np_rng):
    q = np_rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    k = np_rng.standard_normal((2, 4, 12, 8)).astype(np.float32)
    v = np_rng.standard_normal((2, 4, 12, 8)).astype(np.float32)
    scale = 0.3
    out, scores = ka.attention_with_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale
    )
    ref_sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
    np.testing.assert_allclose(np.asarray(scores), ref_sim.mean(1), atol=1e-5)
    assert out.shape == (2, 4, 8, 8)
