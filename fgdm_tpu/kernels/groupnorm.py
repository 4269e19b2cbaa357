"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm's awkward TPU shape (channel-contiguous groups of C/32 ≪ 128
lanes) is handled by computing the group reductions **on the MXU**: per-
channel sums come from ``ones[1,N] @ x`` and group sums from a one-hot
membership matmul ``[1,C] @ M[C,G]``; per-channel μ/σ are broadcast back
through ``M @ stats``.  One elementwise pass then normalizes, applies the
affine, and fuses the SiLU — a single HBM round trip for the whole
norm+activation (the unfused path reads/writes the activation twice).

The two-phase chunked grid scales to any activation size (512² VAE decode
included): phase 0 streams chunk-sized blocks accumulating channel sums in
a VMEM scratch, phase 1 streams them again to normalize — so only a chunk
(budgeted by ``_CHUNK_ELEMS``) sits in VMEM at a time.  Used behind
``fgdm_tpu.nn.layers.GroupNorm32(fused=True)``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_INTERPRET = os.environ.get("FGDM_PALLAS_INTERPRET", "0") == "1"


# Measured on v5e-1 (full chain, batch 4): 1024 ≥ 512 (1.484 vs 1.479
# img/s, within the ±0.005 run-to-run noise band but never worse).
_ROW_CHUNK = int(os.environ.get("FGDM_GN_ROW_CHUNK", "1024"))
# VMEM budget per block in elements: the kernel holds the chunk in bf16
# plus f32 temporaries (~17B/row-elem with double buffering).  1M elems
# was borderline: 1024×960 chunks (983K elems) measured 16.38M scoped
# vmem — 388K OVER the 16M limit — and whether the compile survives
# depends on scheduler effort (default effort happened to fit, the
# r3 lowopt probe and a batch-1 ControlLDM init did not).  768K keeps
# the hot c≤512 shapes at full 1024-row chunks and halves only wide-c
# blocks (512×960 = 8.4M measured headroom).
_CHUNK_ELEMS = int(os.environ.get("FGDM_GN_CHUNK_ELEMS", str(768 * 1024)))
# Feed NHWC blocks to the kernel without the XLA-side flatten (chunked over
# H).  Measured on v5e: the flatten's layout copies looked costly in the
# HLO, but the native-4D path benched *slower* end-to-end (train step 125
# -> 118 img/s; chain flat) — default off, kept as an A/B knob.
_NATIVE_4D = os.environ.get("FGDM_GN_NATIVE_4D", "0") == "1"


def _pick_chunk(spatial: int, c: int) -> int:
    ck = min(_ROW_CHUNK, spatial)
    while ck > 128 and ck * c > _CHUNK_ELEMS:
        ck //= 2
    while spatial % ck and ck > 8:
        ck //= 2
    return ck


def _kernel(x_ref, scale_ref, bias_ref, m_ref, o_ref, stats_ref, *, eps,
            count, apply_silu):
    """Two-phase chunked grid: phase 0 accumulates per-channel sums into a
    VMEM scratch that persists across the (sequential) TPU grid; phase 1
    normalizes each chunk.  Only chunk-sized blocks ever sit in VMEM, so
    arbitrarily large N·C works (a whole-array block OOMs scoped vmem at
    UNet skip-concat widths like 4096x960).

    Blocks arrive in the input's NATIVE rank ([1, ck, C] or [1, ckh, W, C])
    and are flattened to [rows, C] *inside* the kernel — a free VMEM view.
    Reshaping [B,H,W,C]→[B,H·W,C] on the XLA side forced a physical copy of
    every activation into the custom call's operand layout (measured: two
    extra 128MB copies per VAE-encoder norm at 256²/batch 8)."""
    phase = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _():
        blk = x_ref[0]
        chunk = blk.reshape(-1, blk.shape[-1]).astype(jnp.float32)  # [ck, C]
        ones = jnp.ones((1, chunk.shape[0]), jnp.float32)
        # HIGHEST precision: TPU matmuls default to bf16 passes, which is
        # not enough for mean/variance accumulation
        colsum = jax.lax.dot_general(
            ones, chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        colsq = jax.lax.dot_general(
            ones, chunk * chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        stats_ref[0:1, :] += colsum
        stats_ref[1:2, :] += colsq

    @pl.when(phase == 1)
    def _():
        m = m_ref[...].astype(jnp.float32)            # [C, G]
        colsum = stats_ref[0:1, :]
        colsq = stats_ref[1:2, :]
        gsum = jax.lax.dot_general(                   # [1, G]
            colsum, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gsq = jax.lax.dot_general(
            colsq, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mean_g = gsum / count
        var_g = gsq / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        # broadcast group stats back to channels: [1,G] @ M^T -> [1,C]
        mean_c = jax.lax.dot_general(
            mean_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        inv_c = jax.lax.dot_general(
            inv_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mul = inv_c * scale_ref[...].astype(jnp.float32)
        add = bias_ref[...].astype(jnp.float32) - mean_c * mul
        blk = x_ref[0]
        x2 = blk.reshape(-1, blk.shape[-1]).astype(jnp.float32)
        y = x2 * mul + add
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.reshape(blk.shape).astype(o_ref.dtype)


def _chunking(x):
    """(chunk-rows-of-leading-spatial-dim, n_chunks, block_shape fn)."""
    c = x.shape[-1]
    spatial = int(np.prod(x.shape[1:-1]))
    if x.ndim == 4 and _NATIVE_4D:
        _, h, w, _ = x.shape
        ckh = max(1, _pick_chunk(spatial, c) // w)
        while h % ckh:
            ckh -= 1
        return ckh, h // ckh
    ck = _pick_chunk(spatial, c)
    return ck, spatial // ck


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                             "apply_silu"))
def _fused(x, scale, bias, num_groups, eps, apply_silu):
    b = x.shape[0]
    c = x.shape[-1]
    spatial = int(np.prod(x.shape[1:-1]))
    ck, n_chunks = _chunking(x)
    # The auto-dispatch guard checks divisibility before choosing this path;
    # a forced use_fused=True caller must fail loudly here — flooring the
    # chunk count would silently drop trailing rows from the group statistics
    # and leave their output uninitialized.
    if x.ndim == 4 and _NATIVE_4D:
        assert x.shape[1] % ck == 0, (
            f"fused GroupNorm needs H ({x.shape[1]}) divisible by the row "
            f"chunk ({ck}); use the XLA path for this shape")
        assert ck * n_chunks == x.shape[1]
    else:
        assert spatial % ck == 0, (
            f"fused GroupNorm needs the flattened spatial size ({spatial}) "
            f"divisible by the row chunk ({ck}); use the XLA path for this "
            "shape")
    groups = np.repeat(np.arange(num_groups), c // num_groups)
    m = jnp.asarray(np.eye(num_groups, dtype=np.float32)[groups])  # [C, G]
    count = float(spatial * (c // num_groups))
    orig_shape = x.shape
    if x.ndim == 4 and _NATIVE_4D:
        # native NHWC blocks (chunked over H): no XLA-side flatten copy
        w = x.shape[2]
        in_spec = pl.BlockSpec((1, ck, w, c), lambda bb, p, i: (bb, i, 0, 0))
    else:
        x = x.reshape(b, spatial, c)
        in_spec = pl.BlockSpec((1, ck, c), lambda bb, p, i: (bb, i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=float(eps), count=count,
                          apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, 2, n_chunks),
        in_specs=[
            in_spec,
            pl.BlockSpec((1, c), lambda bb, p, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, p, i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda bb, p, i: (0, 0)),
        ],
        out_specs=in_spec,
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_INTERPRET,
    )(x, scale.reshape(1, c), bias.reshape(1, c), m)
    return out.reshape(orig_shape)


def _xla_group_norm(x, scale, bias, num_groups, eps, apply_silu):
    orig_dtype = x.dtype
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    spatial = xf.shape[1:-1]
    xg = xf.reshape(xf.shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape((xf.shape[0],) + spatial + (c,)) * scale + bias
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# Differentiable wrapper: the Pallas kernel has no automatic transpose, so
# training routes the backward through jax.vjp of the XLA reference math
# (numerically the same function; the fused kernel only accelerates fwd).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_op(x, scale, bias, num_groups, eps, apply_silu):
    return _fused(x, scale, bias, num_groups, eps, apply_silu)


def _fused_op_fwd(x, scale, bias, num_groups, eps, apply_silu):
    return _fused(x, scale, bias, num_groups, eps, apply_silu), (
        x, scale, bias)


def _fused_op_bwd(num_groups, eps, apply_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _xla_group_norm(xx, ss, bb, num_groups, eps,
                                           apply_silu),
        x, scale, bias,
    )
    return vjp(g)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
    use_fused: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm → affine → (SiLU), fused on TPU when it fits VMEM."""
    c = x.shape[-1]
    if use_fused is None:
        spatial = int(np.prod(x.shape[1:-1]))
        # 4D chunks over H (always divisible by construction); other ranks
        # flatten and need the row chunk to divide the spatial size
        ok_chunks = ((x.ndim == 4 and _NATIVE_4D)
                     or spatial % _pick_chunk(spatial, c) == 0)
        use_fused = (
            _HAS_PLTPU and (_on_tpu() or _INTERPRET)
            and c % num_groups == 0 and c >= 128
            and ok_chunks
        )
    if use_fused:
        return _fused_op(x, scale.astype(jnp.float32),
                         bias.astype(jnp.float32), num_groups, float(eps),
                         apply_silu)
    return _xla_group_norm(x, scale, bias, num_groups, eps, apply_silu)
