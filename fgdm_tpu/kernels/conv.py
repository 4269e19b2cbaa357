"""Pallas TPU direct 3×3 convolution for the UNet hot shapes.

XLA's conv_general_dilated measures 24-48% MXU at SD-UNet shapes on v5e
(NEXT.md §7), and the XLA-level shift-and-matmul rewrite loses outright
(9× HBM reads of the input).  This kernel keeps the whole padded input
plane of one batch item resident in VMEM and runs the nine shifted
[bh·W, C] × [C, Co] contractions from there — HBM traffic is exactly
1× input + 1× weights + 1× output, and every MXU pass has contraction
width C ≥ 320.

Scope (asserted): stride 1, SAME padding, 3×3, NHWC, plane small enough
for VMEM residency — the ResBlock convs of the UNet/ControlNet at latent
resolutions (64² and below).  The VAE's 256²/512² planes don't fit and
stay on the XLA path (``conv3x3_ok`` gates dispatch).

Reference counterpart: every ``conv_nd(dims, ..., 3, padding=1)`` in
`/root/reference/ldm/modules/diffusionmodules/openaimodel.py` (ResBlock
in/out layers, `util.py:conv_nd`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("FGDM_PALLAS_INTERPRET", "0") == "1"
_DISABLE = os.environ.get("FGDM_DISABLE_PALLAS_CONV", "0") == "1"

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["conv3x3", "conv3x3_ok"]

# Scoped-VMEM fit model.  Mosaic double-buffers every pipelined ref block
# (measured: a [*,66,66,640] plane with bco=128/bh=32 allocated 16.41 MB of
# scoped VMEM against an 8.1 MB naive block sum — almost exactly 2×), so the
# model counts each ref block twice plus the f32 accumulator once.  The
# budget leaves ~3.5 MB below the 16 MB hard limit because *in-chain*
# compilation inflates actual scoped usage over this standalone model by
# ~1.9 MB (measured: (64², 640→640) modeled 14.45 MB standalone-compiles
# fine but allocates 16.31 MB inside the chain program — Mosaic scheduling
# is program-context-dependent, same lesson as the fused-GN chunk budget).
# An AOT sweep of all 29 chain conv shapes is in tools/probe_conv_fit.py.
_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def _scoped_vmem(h, w, c, co, bh, bco, itemsize):
    plane = (h + 2) * (w + 2) * c * itemsize
    wblk = 9 * c * bco * itemsize
    oblk = bh * w * bco * itemsize
    acc = bh * w * bco * 4
    return 2 * (plane + wblk + oblk) + acc


def _pick_blocks(h, w, c, co, itemsize):
    # Mosaic block rule: a blocked (non-full) minor dim must be a multiple
    # of 128 (lanes).  Candidates: co itself, else 128-multiple divisors.
    cands = [co] + [m for m in range(co - 128, 127, -128)
                    if co % m == 0 and m % 128 == 0]
    bco = cands[-1]
    for m in cands:
        if 9 * c * m * itemsize <= 4 * 1024 * 1024:
            bco = m
            break
    bh = h
    while bh > 8 and (_scoped_vmem(h, w, c, co, bh, bco, itemsize)
                      > _VMEM_BUDGET or h % bh):
        bh //= 2
    while h % bh:
        bh //= 2
    total = _scoped_vmem(h, w, c, co, bh, bco, itemsize)
    if total > _VMEM_BUDGET:
        # The 4MB weight-block preference overshot (e.g. 64²·512→512 picks
        # bco=384 and busts the budget): retry the remaining, smaller co
        # blocks before giving up — only reached where the old picker
        # already failed, so established picks are unchanged.
        for m in cands:
            if m >= bco:
                continue
            bh2 = h
            while bh2 > 8 and (_scoped_vmem(h, w, c, co, bh2, m, itemsize)
                               > _VMEM_BUDGET or h % bh2):
                bh2 //= 2
            t2 = _scoped_vmem(h, w, c, co, bh2, m, itemsize)
            if t2 <= _VMEM_BUDGET and h % bh2 == 0:
                return bh2, m, t2
    return bh, bco, total


def _kernel(xp_ref, w_ref, b_ref, o_ref, *, bh, w_len, kdim):
    """One (batch, row-block, co-block) program.

    xp_ref: [1, H+2, W+2, C] full padded plane (resident across the
    sequential row/co grid); w_ref: [9, C, bco]; o_ref: [1, bh, W, bco].
    The nine taps are shifted full-width slices of the plane — reads from
    VMEM, no HBM re-touch.  dy/dx are Python-unrolled so every slice start
    is static except the row-block offset.
    """
    i = pl.program_id(1)
    acc = jnp.zeros((bh * w_len, o_ref.shape[-1]), jnp.float32)
    for dy in range(kdim):
        for dx in range(kdim):
            xs = xp_ref[0, pl.ds(i * bh + dy, bh), pl.ds(dx, w_len), :]
            xs2 = xs.reshape(bh * w_len, xs.shape[-1])
            acc = acc + jax.lax.dot_general(
                xs2, w_ref[dy * kdim + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, w_len, -1).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def conv3x3_ok(x_shape, w_shape, dtype) -> bool:
    """True when the Pallas path covers this conv (see module docstring)."""
    if not (_HAS_PLTPU and not _DISABLE):
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, c, co = w_shape
    # Mosaic pads C/Co to lane tiles itself; the gates are only about MXU
    # viability (width ≥ 128) and clean block divisibility.
    if (kh, kw) != (3, 3) or c < 128 or co < 128 or c % 8 or co % 8:
        return False
    _, h, w, _ = x_shape
    # MXU row fill: each tap contracts [bh·w, c] — at 8² and below that is
    # ≤64 rows per pass (<50% of the 128-row MXU) while XLA batches the
    # conv across the N axis; 128² planes are VAE-decoder-only, where the
    # fused XLA conv pipeline wins.  Chain A/B (r3): unrestricted Pallas
    # dispatch measured 1.31 img/s vs 1.62 XLA.
    if h < 16 or h > 64:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    bh, bco, total = _pick_blocks(h, w, c, co, itemsize)
    return total <= _VMEM_BUDGET and h % bh == 0


def _run_padded(xp, w9, b2, h, w_len, c, co, bh, bco):
    """The pallas_call on an already-padded [N, h+2, w+2, C] input."""
    n = xp.shape[0]
    grid = (n, h // bh, co // bco)
    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_len=w_len, kdim=3),
        out_shape=jax.ShapeDtypeStruct((n, h, w_len, co), xp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2, w_len + 2, c), lambda g, i, j: (g, 0, 0, 0)),
            pl.BlockSpec((9, c, bco), lambda g, i, j: (0, 0, j)),
            pl.BlockSpec((1, bco), lambda g, i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bh, w_len, bco),
                               lambda g, i, j: (g, i, 0, j)),
        interpret=_INTERPRET,
    )(xp, w9, b2)


def _conv3x3_fwd(x, w, b):
    n, h, w_len, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, c, co)
    bh, bco, _ = _pick_blocks(h, w_len, c, co, x.dtype.itemsize)
    b2 = jnp.broadcast_to(b.astype(jnp.float32)[None, :], (1, co))
    return _run_padded(xp, w9, b2, h, w_len, c, co, bh, bco)


# ---------------------------------------------------------------------------
# Height-slab decomposition for planes too large for VMEM residency
# ---------------------------------------------------------------------------
#
# The VAE decoder's 128²-512² planes (models/autoencoder.py:Decoder;
# reference `ldm/modules/diffusionmodules/model.py:Decoder`) exceed the
# whole-plane VMEM budget, yet XLA's conv runs them at only 37-63 TF/s
# when co ≤ 256 and 19 TF/s at 64²·512 (tools/profile_vae.py).  A SAME
# 3×3 conv is separable over height slabs given a one-row halo — and the
# kernel above already consumes a *pre-padded* plane, so the halo IS the
# padding: slice s overlapping [hs+2]-row slabs from the padded input,
# fold them into the batch axis, and run the identical kernel at h=hs.
# The only new work is the XLA-side slab gather (≈(hs+2)/hs ≤ 1.25×
# input bytes — noise against the conv's FLOPs at these shapes).

def _pick_slabs(h, w, c, co, itemsize):
    """Smallest power-of-two slab grid whose slab fits VMEM.

    Returns (sh, sw, bh, bco) or None.  Height slabs first (free: rows are
    contiguous); width slabs only when even 8-row slabs overflow (≥1024²
    planes, where the per-pass row block bh·ws and its f32 accumulator
    scale with the width).  Slab sides stay ≥ 8.
    """
    sw = 1
    while w // sw >= 8 and w % sw == 0:
        ws = w // sw
        sh = 1
        while h // sh >= 8 and h % sh == 0:
            hs = h // sh
            bh, bco, total = _pick_blocks(hs, ws, c, co, itemsize)
            if total <= _VMEM_BUDGET and hs % bh == 0:
                return sh, sw, bh, bco
            sh *= 2
        sw *= 2
    return None


def _conv3x3_slab_fwd(x, w, b):
    n, h, w_len, c = x.shape
    co = w.shape[-1]
    picked = _pick_slabs(h, w_len, c, co, x.dtype.itemsize)
    assert picked is not None, (x.shape, w.shape)
    sh, sw, bh, bco = picked
    hs, ws = h // sh, w_len // sw
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    slabs = jnp.stack(
        [jnp.stack(
            [xp[:, kh * hs:kh * hs + hs + 2, kw * ws:kw * ws + ws + 2]
             for kw in range(sw)], axis=1)
         for kh in range(sh)], axis=1,
    ).reshape(n * sh * sw, hs + 2, ws + 2, c)
    w9 = w.reshape(9, c, co)
    b2 = jnp.broadcast_to(b.astype(jnp.float32)[None, :], (1, co))
    out = _run_padded(slabs, w9, b2, hs, ws, c, co, bh, bco)
    out = out.reshape(n, sh, sw, hs, ws, co).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, h, w_len, co)


def conv3x3_vae_ok(x_shape, w_shape, dtype) -> bool:
    """Slab-path dispatch gate: the measured-win family only.

    Chained A/B at the decode shapes (batch 4, bf16, v5e; 3-iteration
    min):  512²·128→128 — slab 6.72 ms vs XLA 11.23 (46 vs 27.5 TF/s,
    +67%); every other plane is a wash (128²/256²: ±4%) or a loss
    (64²·512→512: −12%), so only the largest-plane lowest-channel
    convs — the decoder's level-0 ResBlocks, and their ≥1024²
    counterparts — dispatch here.  The UNet backbone stays on XLA
    everywhere (r3 chain A/B: fused XLA conv pipeline wins).

    Full-chain A/B verdict (what decides the default): 1.6199 img/s with
    the slab path vs 1.6188 without — noise.  The standalone 11.23 ms
    XLA number is not what the chain pays; in-program convs overlap with
    neighbouring ops and fuse their epilogues.  Shipping it would add
    ~114 s of Mosaic compile (superlinear in custom-call count, NEXT.md)
    for no measured chain win, so `FGDM_PALLAS_CONV_VAE` defaults off;
    the kernel remains for chips/shapes where the balance differs
    (e.g. ≥1024² tiled decode)."""
    if not (_HAS_PLTPU and not _DISABLE):
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, c, co = w_shape
    if (kh, kw) != (3, 3) or c != 128 or co != 128:
        return False
    _, h, w, _ = x_shape
    if h < 512:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _pick_slabs(h, w, c, co, itemsize) is not None


def _xla_conv3x3(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def conv3x3(x, w, b):
    """3×3 stride-1 SAME conv, NHWC/HWIO, bias included.

    Whole-plane Pallas when ``conv3x3_ok`` holds, height-slab Pallas for
    the ``conv3x3_vae_ok`` family, XLA otherwise.  The backward pass uses
    XLA's conv transpose/grad forms either way — training steps remat
    their convs, so the forward kernel is what the step replays.
    """
    if conv3x3_ok(x.shape, w.shape, x.dtype):
        return _conv3x3_fwd(x, w, b)
    if conv3x3_vae_ok(x.shape, w.shape, x.dtype):
        return _conv3x3_slab_fwd(x, w, b)
    return _xla_conv3x3(x, w, b)


def _conv3x3_vjp_fwd(x, w, b):
    return conv3x3(x, w, b), (x, w)


def _conv3x3_vjp_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    # dX: correlate the cotangent with the spatially-flipped, IO-swapped
    # kernel; dW: patch-correlate input with cotangent (XLA grad forms).
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        gf, w_flip.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0),      # [C, H+2, W+2, N]: C as batch
        gf.transpose(1, 2, 0, 3),      # [H, W, N, Co]: N as input channels
        (1, 1), "VALID",               # output spatial (H+2)-H+1 = 3
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3).astype(w.dtype)           # [3, 3, C, Co]
    db = jnp.sum(gf, axis=(0, 1, 2))
    return dx, dw, db


conv3x3.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)
