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


@pytest.mark.parametrize("d,nq,nk", [(40, 512, 512), (80, 384, 256),
                                     (40, 512, 256)])
def test_flash_attention_transposed_matches_xla(np_rng, monkeypatch, d, nq, nk):
    monkeypatch.setattr(ka, "_INTERPRET", True)
    q = np_rng.standard_normal((1, 2, nq, d)).astype(np.float32)
    k = np_rng.standard_normal((1, 2, nk, d)).astype(np.float32)
    v = np_rng.standard_normal((1, 2, nk, d)).astype(np.float32)
    scale = 1 / math.sqrt(d)
    ref = ka._xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    out = ka._flash_attention_t(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=128, block_k=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_dispatch_routes_small_head_dims(monkeypatch):
    seen = []
    monkeypatch.setattr(ka, "_flash_attention_t",
                        lambda q, k, v, s: seen.append("t") or q)
    monkeypatch.setattr(ka, "_flash_attention",
                        lambda q, k, v, s: seen.append("row") or q)
    monkeypatch.setattr(ka, "_FLASH_TRANSPOSED", True)
    q40 = jnp.zeros((1, 1, 8, 40))
    q128 = jnp.zeros((1, 1, 8, 128))
    ka._flash_dispatch(q40, q40, q40, 1.0)
    ka._flash_dispatch(q128, q128, q128, 1.0)
    assert seen == ["t", "row"]


@pytest.mark.parametrize("b,h,nq,nk,d", [
    (2, 1, 1024, 1024, 512),   # VAE mid attention (512² decode, scaled down)
    (1, 2, 600, 512, 512),     # padded q rows
    (1, 1, 512, 1024, 160),    # wide row-major head dim, nq < nk
])
def test_flash_attention_kv_stream_matches_xla(np_rng, monkeypatch,
                                               b, h, nq, nk, d):
    monkeypatch.setattr(ka, "_INTERPRET", True)
    q = np_rng.standard_normal((b, h, nq, d)).astype(np.float32)
    k = np_rng.standard_normal((b, h, nk, d)).astype(np.float32)
    v = np_rng.standard_normal((b, h, nk, d)).astype(np.float32)
    scale = 1 / math.sqrt(d)
    ref = ka._xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            scale)
    out = ka._flash_attention_kv(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=256, block_k=256,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_dispatch_streams_oversized_kv(monkeypatch):
    seen = []
    monkeypatch.setattr(ka, "_flash_attention_kv",
                        lambda q, k, v, s: seen.append("kv") or q)
    monkeypatch.setattr(ka, "_flash_attention",
                        lambda q, k, v, s: seen.append("row") or q)
    monkeypatch.setattr(ka, "_FLASH_TRANSPOSED", False)
    # f32 single head d=512: whole-KV residency 2·2·nk·512·4 bytes crosses
    # the 8 MB budget at nk=2048
    big = jnp.zeros((1, 1, 4096, 512))
    small = jnp.zeros((1, 1, 512, 512))
    ka._flash_dispatch(big, big, big, 1.0)
    ka._flash_dispatch(small, small, small, 1.0)
    assert seen == ["kv", "row"]


@pytest.mark.parametrize("d,nq,nk", [(40, 512, 512), (80, 256, 384)])
def test_flash_backward_transposed_matches_xla_vjp(np_rng, monkeypatch,
                                                   d, nq, nk):
    monkeypatch.setattr(ka, "_INTERPRET", True)
    q = np_rng.standard_normal((1, 2, nq, d)).astype(np.float32)
    k = np_rng.standard_normal((1, 2, nk, d)).astype(np.float32)
    v = np_rng.standard_normal((1, 2, nk, d)).astype(np.float32)
    g = np_rng.standard_normal((1, 2, nq, d)).astype(np.float32)
    scale = 1 / math.sqrt(d)

    _, xla_vjp = jax.vjp(
        lambda qq, kk, vv: ka._xla_attention(qq, kk, vv, scale),
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    dq_ref, dk_ref, dv_ref = xla_vjp(jnp.asarray(g))

    o, lse = ka._flash_attention_t(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=128, block_k=128, return_lse=True)
    dq, dk, dv = ka._flash_backward_t(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), o, lse,
        jnp.asarray(g), scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=5e-3, rtol=1e-3)


def test_flash_op_grad_through_custom_vjp(np_rng, monkeypatch):
    """End-to-end: jax.grad through _flash_op hits the Pallas backward."""
    monkeypatch.setattr(ka, "_INTERPRET", True)
    monkeypatch.setattr(ka, "_FLASH_BWD", True)
    monkeypatch.setattr(ka, "_FLASH_TRANSPOSED", True)
    q = jnp.asarray(np_rng.standard_normal((1, 1, 256, 40)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((1, 1, 256, 40)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((1, 1, 256, 40)), jnp.float32)
    scale = 1 / math.sqrt(40)

    def loss_flash(q, k, v):
        return jnp.sum(ka._flash_op(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(ka._xla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


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


def test_pooled_scores_capture_matches_pooled_full_map(np_rng):
    """pool_kq folds the consumer's avg-pool into q/k — must equal pooling
    the full raw map (the linearity that makes reduced capture exact)."""
    from fgdm_tpu.utils.attention_maps import avg_pool_map_2x

    q = np_rng.standard_normal((2, 4, 64, 8)).astype(np.float32)
    k = np_rng.standard_normal((2, 4, 64, 8)).astype(np.float32)
    v = np_rng.standard_normal((2, 4, 64, 8)).astype(np.float32)
    scale = 0.3
    _, full = ka.attention_with_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale
    )
    _, pooled = ka.attention_with_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, pool_kq=4
    )
    assert pooled.shape == (2, 16, 16)
    ref = avg_pool_map_2x(full, times=2)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), atol=1e-5)


def test_capture_spec_filters_and_pools_self_maps(np_rng):
    """CaptureSpec routes inside CrossAttention: mismatched-N self layers
    emit no map; matching layers emit the pooled map."""
    from fgdm_tpu.nn.attention import CaptureSpec, CrossAttention

    x = jnp.asarray(np_rng.standard_normal((2, 64, 32)).astype(np.float32))
    attn = CrossAttention(query_dim=32, heads=4, dim_head=8)
    params = attn.init(jax.random.PRNGKey(0), x)

    # full capture for the oracle map
    _, full = attn.apply(params, x, capture=True)
    # matching self_n with pooling
    out_p, pooled = attn.apply(
        params, x, capture=CaptureSpec(self_n=64, self_pool=4))
    assert pooled.shape == (2, 16, 16)
    from fgdm_tpu.utils.attention_maps import avg_pool_map_2x

    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(avg_pool_map_2x(full, times=2)),
        atol=1e-5)
    # mismatched self_n: no map, identical attention output
    out_f, filtered = attn.apply(params, x, capture=CaptureSpec(self_n=256))
    assert filtered is None
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-6)
    # cross-attention under a spec still captures unpooled
    ctx = jnp.asarray(np_rng.standard_normal((2, 12, 32)).astype(np.float32))
    cattn = CrossAttention(query_dim=32, context_dim=32, heads=4, dim_head=8)
    cparams = cattn.init(jax.random.PRNGKey(0), x, context=ctx)
    _, cmap = cattn.apply(
        cparams, x, context=ctx, capture=CaptureSpec(self_n=999, self_pool=4))
    assert cmap is not None and cmap.shape == (2, 64, 12)
