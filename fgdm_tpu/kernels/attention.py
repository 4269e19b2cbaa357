"""Multi-head attention compute path with a Pallas TPU flash kernel.

Dispatch: ``multihead_attention`` takes ``[B, H, Nq, D]`` q and ``[B, H, Nk, D]``
k/v and returns ``[B, H, Nq, D]``.  On TPU with large sequences it runs the
Pallas flash kernel (no N×N materialization in HBM); elsewhere (CPU tests,
tiny sequences, capture mode) it falls back to a pure-XLA einsum path that XLA
fuses well.

Reference behavioural contract (`/root/reference/ldm/modules/attention.py:
152-216`): scores = (q·k^T)·scale, softmax over keys, weighted sum of v.  The
reference also exposes the *head-averaged raw scores* for attention-map
capture; that path is served by ``attention_with_scores`` (XLA) since capture
steps are rare and need the full map anyway.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Interpreter mode lets the flash kernel run (slowly) on CPU for testing.
_INTERPRET = os.environ.get("FGDM_PALLAS_INTERPRET", "0") == "1"
# A/B kill-switch for macro benchmarking.
_DISABLE_FLASH = os.environ.get("FGDM_DISABLE_FLASH", "0") == "1"
# Minimum sequence length for the flash path (tunable: at small N the XLA
# einsum path with materialized scores can win since d≪128 pads 3×).
_FLASH_MIN_N = int(os.environ.get("FGDM_FLASH_MIN_N", "512"))
# Block sizes (A/B-tunable): q rows per program / k rows per inner dot.
# Larger blocks amortize loop overhead; VMEM cost of the score tile is
# block_q×block_k×4B (f32), so 512×1024 = 2MB still fits comfortably.
# Measured on v5e-1 (full chain, batch 4): 256/512 → 1.404 img/s,
# 512/1024 → 1.479 img/s (+5.3%).
_FLASH_BLOCK_Q = int(os.environ.get("FGDM_FLASH_BLOCK_Q", "512"))
_FLASH_BLOCK_K = int(os.environ.get("FGDM_FLASH_BLOCK_K", "1024"))

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["multihead_attention", "attention_with_scores"]


def _xla_attention(q, k, v, scale):
    # bf16 operands feed the MXU directly with f32 accumulation — no f32
    # copies of q/k materialize (this path serves every cross-attention:
    # nk=77 < flash threshold).  Softmax stays f32.
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out


def attention_with_scores(q, k, v, scale):
    """Returns (out [B,H,Nq,D], head-averaged scores [B,Nq,Nk] float32).

    The averaged *pre-softmax* scores mirror the reference's
    ``reshape_batch_dim_to_heads_and_average(sim)`` capture output
    (`attention.py:170-175,187-190`).
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    sim = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out, jnp.mean(sim, axis=1)


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    Shapes inside the kernel: q_ref [block_q, d], k_ref/v_ref [kv_len, d],
    o_ref [block_q, d].  d is padded to a lane multiple by the caller.
    """
    # f32 operands with f32 accumulation; Mosaic lowers these to MXU passes
    # itself.  (Measured: explicit bf16 operand casts are *slower* on v5e —
    # 1.455 vs 1.479 img/s on the chain — the casts cost VPU time.)
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kb = kv_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), size


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_attention(q, k, v, scale, block_q=None, block_k=None):
    """q [B,H,Nq,D], k/v [B,H,Nk,D] → [B,H,Nq,D]."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q or _FLASH_BLOCK_Q, max(8, 1 << (nq - 1).bit_length()))
    block_k = min(block_k or _FLASH_BLOCK_K, max(128, 1 << (nk - 1).bit_length()))
    # key padding would corrupt the softmax, so block_k must divide nk
    while nk % block_k and block_k > 128:
        block_k //= 2

    q3 = q.reshape(b * h, nq, d)
    k3 = k.reshape(b * h, nk, d)
    v3 = v.reshape(b * h, nk, d)
    # Pad head dim to lane width and sequence dims to block multiples.
    q3, _ = _pad_to(q3, 2, 128)
    k3, _ = _pad_to(k3, 2, 128)
    v3, _ = _pad_to(v3, 2, 128)
    q3, _ = _pad_to(q3, 1, block_q)
    # Key padding would corrupt softmax (exp(0) mass), so require divisibility;
    # the dispatcher guarantees it.
    assert nk % block_k == 0, (nk, block_k)
    dp = q3.shape[-1]
    nqp = q3.shape[1]

    grid = (b * h, nqp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, kv_len=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, nqp, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, nk, dp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, nk, dp), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda g, i: (g, i, 0)),
        interpret=_INTERPRET,
    )(q3, k3, v3)
    return out[:, :nq, :d].reshape(b, h, nq, d)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# Differentiable wrapper: flash forward, XLA-derived backward (the Pallas
# kernel defines no transpose; the backward re-materializes scores — a
# dedicated flash backward kernel is future work).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_op(q, k, v, scale):
    return _flash_attention(q, k, v, scale)


def _flash_op_fwd(q, k, v, scale):
    return _flash_attention(q, k, v, scale), (q, k, v)


def _flash_op_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda qq, kk, vv: _xla_attention(qq, kk, vv, scale).astype(qq.dtype),
        q, k, v,
    )
    return vjp(g)


_flash_op.defvjp(_flash_op_fwd, _flash_op_bwd)


def multihead_attention(q, k, v, scale=None, use_flash=None):
    """Fused scaled-dot-product attention. q/k/v: [B, H, N, D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    nq, nk = q.shape[2], k.shape[2]
    if use_flash is None:
        use_flash = (
            _HAS_PLTPU
            and not _DISABLE_FLASH
            and _on_tpu()
            and nq >= _FLASH_MIN_N
            and nk >= _FLASH_MIN_N
            and nk % 512 == 0
        )
    if use_flash:
        return _flash_op(q, k, v, float(scale))
    return _xla_attention(q, k, v, float(scale)).astype(q.dtype)
