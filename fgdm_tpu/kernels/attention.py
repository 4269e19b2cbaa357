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
# Transposed-layout kernel for small head dims (SD heads are 40/80/160):
# keeps d on the *sublane* axis so d=40 pads to 40 (5 sublane tiles), not
# to 128 lanes (3.2× MXU waste).  Kill-switch for A/B benchmarking.
_FLASH_TRANSPOSED = os.environ.get("FGDM_FLASH_TRANSPOSED", "1") == "1"
# Transposed-path q block (lanes).  0 = per-shape auto: measured on v5e,
# 1024 wins at [4096,d40] (3.49 vs 4.00 ms) and [1024,d40] (0.71 vs 0.78)
# while 512 edges it at [1024,d80] (0.78 vs 0.81).
_FLASH_T_BLOCK_Q = int(os.environ.get("FGDM_FLASH_T_BLOCK_Q", "0"))
# Head dims at or above the lane width gain nothing from the transposed
# layout (no padding to remove); keep the row-major kernel there.
_TRANSPOSE_MAX_D = int(os.environ.get("FGDM_FLASH_TRANSPOSE_MAX_D", "96"))

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


def attention_with_scores(q, k, v, scale, pool_kq=1):
    """Returns (out [B,H,Nq,D], head-averaged scores [B,Nq/p,Nk/p] float32).

    The averaged *pre-softmax* scores mirror the reference's
    ``reshape_batch_dim_to_heads_and_average(sim)`` capture output
    (`attention.py:170-175,187-190`).

    mean_h(Q_h·K_hᵀ·scale) contracts h and d jointly — one einsum with a
    contraction width of h·d (320 for SD: MXU-perfect), so capture never
    materializes the per-head [B,H,N,N] score tensor; the attention output
    itself goes through ``multihead_attention`` (flash on TPU).  Capture
    steps now cost ~the same as fast steps plus one [B,Nq,Nk] map.

    ``pool_kq`` > 1 emits the scores already average-pooled by that factor
    over flat windows on *both* token axes.  Pooling a bilinear form is
    linear: pool_w(QKᵀ)[I,J] = (w⁻²ΣᵢΣⱼ qᵢ·kⱼ) = (w⁻¹Σᵢqᵢ)·(w⁻¹Σⱼkⱼ) =
    pool_w(Q)·pool_w(K)ᵀ — bit-for-bit the map the consumer would get from
    ``avg_pool_map_2x`` on the raw scores (same flat-window semantics as
    the reference's ``downsample1`` AvgPool2d, ddpm.py:130,1813), but the
    pooling moves to the tiny O(N·d) q/k tensors: the einsum output shrinks
    p², so the 67 MB-per-sample raw teacher maps at N=4096 never touch HBM
    and the capture einsum does p² fewer FLOPs.
    """
    h = q.shape[1]
    out = multihead_attention(q, k, v, scale)
    # fold the scale into q before the contraction: a post-einsum multiply
    # materializes a second full [B,Nq,Nk] buffer (128MB per captured layer
    # at N=4096) — scaling the tiny q tensor is free
    qs = q.astype(jnp.float32) * (float(scale) / h)
    ks = k
    if pool_kq > 1:
        b, hh, nq, d = qs.shape
        nk = k.shape[2]
        assert nq % pool_kq == 0 and nk % pool_kq == 0, (nq, nk, pool_kq)
        qs = qs.reshape(b, hh, nq // pool_kq, pool_kq, d).mean(axis=3)
        ks = k.astype(jnp.float32).reshape(
            b, hh, nk // pool_kq, pool_kq, d).mean(axis=3)
    scores = jnp.einsum(
        "bhid,bhjd->bij", qs, ks, preferred_element_type=jnp.float32
    )
    return out, scores


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


def _flash_kernel_t(qt_ref, kt_ref, v_ref, ot_ref, *out_refs, scale, block_k,
                    kv_len):
    """Transposed-layout flash program: head dim on sublanes, queries on lanes.

    Shapes inside the kernel: qt_ref [d, block_q], kt_ref [d, kv_len],
    v_ref [kv_len, d], ot_ref [d, block_q].  With d ∈ {40, 80} (the SD-1.x
    head dims at ds ∈ {1, 2}) every matmul is full-width:

      scoresᵀ = dot(kᵀ, qᵀ) contracting d over *sublanes*  → [block_k, block_q]
      accᵀ   += dot(v, p)   contracting block_k            → [d, block_q]

    so the MXU never sees the 40→128 lane padding the row-major kernel pays
    (3.2× wasted passes on both QKᵀ and PV at d=40).  Softmax stats are
    [1, block_q] row vectors; the keys reduction runs over sublanes.

    When an extra output ref is given, writes the per-query logsumexp of the
    scaled scores into it ([1, block_q]) — the residual the flash backward
    needs to rebuild p without a second softmax pass.
    """
    qt = qt_ref[0].astype(jnp.float32) * scale  # [d, block_q]
    d, block_q = qt.shape
    num_kb = kv_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        st = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_k, block_q]
        m_new = jnp.maximum(m_i, jnp.max(st, axis=0, keepdims=True))
        p = jnp.exp(st - m_new)  # [block_k, block_q]
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, block_q]
        return acc, m_new, l_new

    acc = jnp.zeros((d, block_q), jnp.float32)
    m_i = jnp.full((1, block_q), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((1, block_q), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    ot_ref[0] = (acc / l_i).astype(ot_ref.dtype)
    if out_refs:
        out_refs[0][0] = m_i + jnp.log(l_i)


def _t_layout(q, k, v, block_q, block_k):
    """Shared prep for the transposed kernels: [B,H,N,D] → padded [BH,d,N]."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qt = q.reshape(b * h, nq, d).swapaxes(1, 2)  # [BH, d, nq]
    kt = k.reshape(b * h, nk, d).swapaxes(1, 2)  # [BH, d, nk]
    v3 = v.reshape(b * h, nk, d)
    # d on sublanes: pad to the 8-row tile; nq on lanes: pad to block_q.
    qt, _ = _pad_to(qt, 1, 8)
    kt, _ = _pad_to(kt, 1, 8)
    v3, _ = _pad_to(v3, 2, 8)
    qt, _ = _pad_to(qt, 2, block_q)
    return qt, kt, v3


def _pick_blocks(nq, nk, block_q, block_k):
    block_q = min(block_q or _FLASH_BLOCK_Q, max(128, 1 << (nq - 1).bit_length()))
    block_k = min(block_k or _FLASH_BLOCK_K, max(128, 1 << (nk - 1).bit_length()))
    while nk % block_k and block_k > 128:
        block_k //= 2
    assert nk % block_k == 0, (nk, block_k)
    return block_q, block_k


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "return_lse"))
def _flash_attention_t(q, k, v, scale, block_q=None, block_k=None,
                       return_lse=False):
    """Transposed-layout flash attention: q [B,H,Nq,D] → [B,H,Nq,D].

    The q/k transposes (and the output transpose back) are O(N·d) XLA
    copies — noise next to the O(N²·d) attention compute they unlock.
    With ``return_lse`` also returns the scaled-score logsumexp
    [B*H, 1, nq_padded] consumed by ``_flash_backward_t``."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if block_q is None:
        block_q = _FLASH_T_BLOCK_Q or (1024 if (nq >= 2048 or d <= 48)
                                       else 512)
    block_q, block_k = _pick_blocks(nq, nk, block_q, block_k)
    qt, kt, v3 = _t_layout(q, k, v, block_q, block_k)
    dp = qt.shape[1]
    nqp = qt.shape[2]

    grid = (b * h, nqp // block_q)
    out_shape = [jax.ShapeDtypeStruct((b * h, dp, nqp), q.dtype)]
    out_specs = [pl.BlockSpec((1, dp, block_q), lambda g, i: (g, 0, i))]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b * h, 1, nqp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q), lambda g, i: (g, 0, i)))
    res = pl.pallas_call(
        functools.partial(_flash_kernel_t, scale=scale, block_k=block_k,
                          kv_len=nk),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp, block_q), lambda g, i: (g, 0, i)),
            pl.BlockSpec((1, dp, nk), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, nk, dp), lambda g, i: (g, 0, 0)),
        ],
        out_specs=out_specs,
        interpret=_INTERPRET,
    )(qt, kt, v3)
    out = res[0][:, :d, :nq].swapaxes(1, 2).reshape(b, h, nq, d)
    if return_lse:
        return out, res[1]
    return out


def _pad_to(x, axis, mult, value=0.0):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value), size


# ---------------------------------------------------------------------------
# Pallas flash backward (transposed layout)
# ---------------------------------------------------------------------------
#
# Standard two-kernel flash backward (Dao 2022 §B): rebuild p blockwise from
# the saved logsumexp instead of materializing the N×N score matrix, with
#   delta = rowsum(dO ∘ O)            (computed once in XLA)
#   dS    = p ∘ (dP − delta),  dP = dO·Vᵀ
#   dQ    = scale · dS·K,  dK = scale · dSᵀ·Q,  dV = pᵀ·dO
# All matmuls keep d on sublanes / sequence on lanes, so d=40 costs 40 — the
# same MXU-padding win as the forward.  Replaces the score-rematerializing
# XLA VJP for training-time self-attention.

def _flash_bwd_dq_kernel_t(qt_ref, kt_ref, vt_ref, dot_ref, lse_ref,
                           delta_ref, dqt_ref, *, scale, block_k, kv_len):
    """One (batch·head, q-block) program → dQᵀ [d, block_q]."""
    qt = qt_ref[0].astype(jnp.float32) * scale   # [d, bq]
    do = dot_ref[0].astype(jnp.float32)          # [d, bq]  (dOᵀ)
    lse = lse_ref[0]                             # [1, bq]
    delta = delta_ref[0]                         # [1, bq]
    d, block_q = qt.shape
    num_kb = kv_len // block_k

    def body(i, acc):
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        vt = vt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        st = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bk, bq]
        p = jnp.exp(st - lse)                        # [bk, bq]
        dp = jax.lax.dot_general(
            vt, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bk, bq]
        ds_ = p * (dp - delta)                       # [bk, bq]
        return acc + jax.lax.dot_general(
            kt, ds_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [d, bq]

    acc = jnp.zeros((d, block_q), jnp.float32)
    acc = jax.lax.fori_loop(0, num_kb, body, acc)
    dqt_ref[0] = (acc * scale).astype(dqt_ref.dtype)


def _flash_bwd_dkv_kernel_t(qt_ref, kt_ref, vt_ref, dot_ref, lse_ref,
                            delta_ref, dkt_ref, dvt_ref, *, scale, block_q,
                            q_len):
    """One (batch·head, k-block) program → dKᵀ, dVᵀ [d, block_k].

    Padded query rows are neutralized by the caller: lse is padded with +inf
    (p = exp(−inf) = 0) so they contribute nothing to dK/dV.
    """
    kt = kt_ref[0].astype(jnp.float32)           # [d, bk]
    vt = vt_ref[0].astype(jnp.float32)           # [d, bk]
    d, block_k = kt.shape
    num_qb = q_len // block_q

    def body(i, carry):
        acc_dk, acc_dv = carry
        qt = qt_ref[0, :, pl.ds(i * block_q, block_q)].astype(
            jnp.float32) * scale                 # [d, bq]
        do = dot_ref[0, :, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        lse = lse_ref[0, :, pl.ds(i * block_q, block_q)]    # [1, bq]
        delta = delta_ref[0, :, pl.ds(i * block_q, block_q)]
        st = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, bq]
        p = jnp.exp(st - lse)
        dp = jax.lax.dot_general(
            vt, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, bq]
        ds_ = p * (dp - delta)                   # [bk, bq]
        # A·Bᵀ-form dots: contract the lane (bq) axis of both operands.
        acc_dv = acc_dv + jax.lax.dot_general(
            do, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [d, bk]
        acc_dk = acc_dk + jax.lax.dot_general(
            qt, ds_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [d, bk]
        return acc_dk, acc_dv

    acc_dk = jnp.zeros((d, block_k), jnp.float32)
    acc_dv = jnp.zeros((d, block_k), jnp.float32)
    acc_dk, acc_dv = jax.lax.fori_loop(0, num_qb, body, (acc_dk, acc_dv))
    dkt_ref[0] = acc_dk.astype(dkt_ref.dtype)
    dvt_ref[0] = acc_dv.astype(dvt_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_backward_t(q, k, v, o, lse, do, scale, block_q=None, block_k=None):
    """Flash attention backward, transposed layout → (dq, dk, dv)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if block_q is None:
        block_q = _FLASH_T_BLOCK_Q or (1024 if (nq >= 2048 or d <= 48)
                                       else 512)
    block_q, block_k = _pick_blocks(nq, nk, block_q, block_k)
    qt, kt, v3 = _t_layout(q, k, v, block_q, block_k)
    vt = v3.swapaxes(1, 2)                             # [BH, d, nk]
    dot_ = do.reshape(b * h, nq, d).swapaxes(1, 2)     # [BH, d, nq]
    dot_, _ = _pad_to(dot_, 1, 8)
    dot_, _ = _pad_to(dot_, 2, block_q)
    dp_ = qt.shape[1]
    nqp = qt.shape[2]
    # delta = rowsum(dO ∘ O): one cheap XLA reduction, [BH, 1, nq].
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, nq)
    delta, _ = _pad_to(delta, 2, block_q)
    # lse arrives already padded to nqp from the forward; re-pad defensively
    # with +inf so padded query rows have p = 0 in the dk/dv pass.
    lse = lse[:, :, :nq]
    lse, _ = _pad_to(lse, 2, block_q, value=jnp.inf)

    dqt = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel_t, scale=scale,
                          block_k=block_k, kv_len=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, dp_, nqp), q.dtype),
        grid=(b * h, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, dp_, block_q), lambda g, i: (g, 0, i)),
            pl.BlockSpec((1, dp_, nk), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, dp_, nk), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, dp_, block_q), lambda g, i: (g, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda g, i: (g, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda g, i: (g, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, dp_, block_q), lambda g, i: (g, 0, i)),
        interpret=_INTERPRET,
    )(qt, kt, vt, dot_, lse, delta)

    dkt, dvt = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel_t, scale=scale,
                          block_q=block_q, q_len=nqp),
        out_shape=[jax.ShapeDtypeStruct((b * h, dp_, nk), q.dtype),
                   jax.ShapeDtypeStruct((b * h, dp_, nk), q.dtype)],
        grid=(b * h, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, dp_, nqp), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, dp_, block_k), lambda g, j: (g, 0, j)),
            pl.BlockSpec((1, dp_, block_k), lambda g, j: (g, 0, j)),
            pl.BlockSpec((1, dp_, nqp), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, 1, nqp), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, 1, nqp), lambda g, j: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, dp_, block_k), lambda g, j: (g, 0, j)),
            pl.BlockSpec((1, dp_, block_k), lambda g, j: (g, 0, j)),
        ],
        interpret=_INTERPRET,
    )(qt, kt, vt, dot_, lse, delta)

    dq = dqt[:, :d, :nq].swapaxes(1, 2).reshape(b, h, nq, d)
    dk = dkt[:, :d, :].swapaxes(1, 2).reshape(b, h, nk, d)
    dv = dvt[:, :d, :].swapaxes(1, 2).reshape(b, h, nk, d)
    return dq, dk, dv


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


# Pallas flash backward kill-switch (A/B benchmarking; falls back to the
# score-rematerializing XLA VJP).
_FLASH_BWD = os.environ.get("FGDM_FLASH_BWD", "1") == "1"


def _use_transposed(d):
    return _FLASH_TRANSPOSED and d <= _TRANSPOSE_MAX_D


# ---------------------------------------------------------------------------
# KV-streaming flash (wide head dims / long keys)
# ---------------------------------------------------------------------------
#
# The row-major kernel keeps the whole K/V in VMEM per program — fine for
# the UNet's multi-head shapes, but the VAE's *single-head d=512* mid
# attention (models/autoencoder.py:VaeAttnBlock, reference
# `ldm/modules/diffusionmodules/model.py:AttnBlock`) blows that budget at
# N=4096 (k+v f32 resident = 16 MB before double-buffering; the remote
# compiler rejects it).  XLA is no refuge: every materialized-score variant
# measures 3-4 TF/s at [4,4096,512] (tools/probe_vae_attn.py).  This
# variant streams K/V blocks through the grid's innermost ("arbitrary")
# axis with the online-softmax state living in VMEM scratch across steps —
# the standard TPU flash decomposition — so VMEM holds only
# O(block_q·d + block_k·d) at a time.

def _flash_kernel_kv(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                     scale, nkb):
    """One (batch·head, q-block, k-block) program step.

    q_ref [1, block_q, d], k_ref/v_ref [1, block_k, d] (this step's KV
    block), o_ref [1, block_q, d].  acc/m/l scratch persist across the
    innermost k grid axis; the output block is written once, on the last
    k step (its index map ignores j, so the block stays resident).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]
    # m/l scratch hold the same value in all 128 lanes; a lane-axis max is
    # the cheap way back to a [block_q, 1] column (no 1-lane slice).
    m_prev = jnp.max(m_ref[...], axis=-1, keepdims=True)
    l_prev = jnp.max(l_ref[...], axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nkb - 1)
    def _emit():
        l_fin = jnp.max(l_ref[...], axis=-1, keepdims=True)
        o_ref[0] = (acc_ref[...] / l_fin).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_attention_kv(q, k, v, scale, block_q=None, block_k=None):
    """KV-streaming flash: q [B,H,Nq,D] → [B,H,Nq,D].  Requires nk % block_k
    == 0 (the dispatcher's nk % 512 gate guarantees a valid block_k)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q or _FLASH_BLOCK_Q,
                  max(128, 1 << (nq - 1).bit_length()))
    block_k = block_k or 512
    while nk % block_k and block_k > 128:
        block_k //= 2
    assert nk % block_k == 0, (nk, block_k)

    q3 = q.reshape(b * h, nq, d)
    k3 = k.reshape(b * h, nk, d)
    v3 = v.reshape(b * h, nk, d)
    q3, _ = _pad_to(q3, 2, 128)
    k3, _ = _pad_to(k3, 2, 128)
    v3, _ = _pad_to(v3, 2, 128)
    q3, _ = _pad_to(q3, 1, block_q)
    dp = q3.shape[-1]
    nqp = q3.shape[1]

    grid = (b * h, nqp // block_q, nk // block_k)
    kernel = functools.partial(_flash_kernel_kv, scale=scale,
                               nkb=nk // block_k)
    call = functools.partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, nqp, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda g, i, j: (g, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=_INTERPRET,
    )
    if not _INTERPRET:
        call = functools.partial(call, compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")))
    out = call()(q3, k3, v3)
    return out[:, :nq, :d].reshape(b, h, nq, d)


# Whole-KV VMEM residency model for the row-major kernel: k+v blocks,
# double-buffered by Mosaic.  Above this, stream KV through the grid.
_KV_RESIDENT_BUDGET = int(os.environ.get("FGDM_FLASH_KV_BUDGET",
                                         str(8 * 1024 * 1024)))


def _use_kv_stream(nk, d, itemsize):
    dp = -(-d // 128) * 128
    return 2 * 2 * nk * dp * itemsize > _KV_RESIDENT_BUDGET


def _flash_dispatch(q, k, v, scale):
    """Route to the transposed-layout kernel for sub-lane-width head dims,
    and to the KV-streaming kernel when whole-KV residency won't fit."""
    if _use_transposed(q.shape[-1]):
        return _flash_attention_t(q, k, v, scale)
    if _use_kv_stream(k.shape[2], q.shape[-1], q.dtype.itemsize):
        return _flash_attention_kv(q, k, v, scale)
    return _flash_attention(q, k, v, scale)


# Differentiable wrapper: flash forward + flash backward (transposed layout);
# the row-major kernel keeps an XLA-derived backward that re-materializes
# scores.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_op(q, k, v, scale):
    return _flash_dispatch(q, k, v, scale)


def _flash_op_fwd(q, k, v, scale):
    if _FLASH_BWD and _use_transposed(q.shape[-1]):
        o, lse = _flash_attention_t(q, k, v, scale, return_lse=True)
        return o, (q, k, v, o, lse)
    return _flash_dispatch(q, k, v, scale), (q, k, v, None, None)


def _flash_op_bwd(scale, res, g):
    q, k, v, o, lse = res
    if lse is not None:
        return _flash_backward_t(q, k, v, o, lse, g, scale)
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
