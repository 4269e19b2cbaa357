"""Winograd F(2×2, 3×3) convolution as an XLA-level reformulation.

The chain's 3×3 stride-1 convs run at 24-48% MXU through XLA's direct
algorithm, and the VMEM-plane-resident Pallas kernel measured *slower* in
program context (NEXT.md conv A/B).  Winograd attacks the arithmetic
itself: each 2×2 output tile costs 16 multiplies instead of 36 (2.25×
fewer MXU FLOPs), reorganized as 16 independent [tiles, C] × [C, Co]
contractions — large, regular matmuls that XLA maps straight onto the MXU
with the tile transforms fused as elementwise pre/post passes.

Math (Lavin & Gray, arXiv:1509.09308): for each 4×4 input tile d and 3×3
kernel g,  Y = Aᵀ[(G g Gᵀ) ⊙ (Bᵀ d B)]A  with the F(2,3) matrices below.
Transforms are computed in f32; only the per-coefficient contraction runs
in the compute dtype (bf16 on TPU) with f32 accumulation.

Reference counterpart: every ResBlock/Upsample 3×3 conv
(`/root/reference/ldm/modules/diffusionmodules/openaimodel.py` conv_nd
calls).  Enable with ``FGDM_WINOGRAD_CONV=1`` (A/B flag like
``FGDM_PALLAS_CONV``); numerically ~1 bit looser than direct conv (known
Winograd property), parity-tested in tests/test_winograd.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["conv3x3_winograd", "winograd_ok"]

# F(2x2, 3x3) transform matrices (Lavin & Gray eq. 10-12)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


import os

# The f32 tile-transform intermediate is [B, th, tw, 4, 4, C] — 4× the
# input plane in f32.  At VAE-decode spatial sizes (128-512², c 128-512)
# that is gigabytes per conv and the whole-chain compile runs out of HBM
# by a few MB (measured: "Used 15.75G of 15.75G").  Those convs are
# bandwidth-bound anyway; the arithmetic-bound planes are the UNet's
# (h ≤ 64, c 320-1280), so gate by spatial size.
_MAX_HW = int(os.environ.get("FGDM_WINOGRAD_MAX_HW", "64"))


def winograd_ok(x_shape, w_shape) -> bool:
    """3×3 stride-1 SAME NHWC convs on MXU-favourable planes: channels deep
    enough to fill the MXU, spatial small enough that the 4×-f32 tile
    intermediate stays cheap (UNet planes, not VAE-decode planes)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, c, co = w_shape
    return ((kh, kw) == (3, 3) and c >= 64 and co >= 64
            and x_shape[1] <= _MAX_HW and x_shape[2] <= _MAX_HW)


def _tiles_4x4(xp: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """[B, 2th+2, 2tw+2, C] padded plane → [B, th, tw, 4, 4, C] overlapping
    tiles with stride 2 (16 strided views, no gather)."""
    rows = []
    for r in range(4):
        cols = []
        for s in range(4):
            cols.append(jax.lax.slice(
                xp, (0, r, s, 0),
                (xp.shape[0], r + 2 * th - 1, s + 2 * tw - 1, xp.shape[3]),
                (1, 2, 2, 1)))
        rows.append(jnp.stack(cols, axis=3))          # [B, th, tw, 4, C]
    return jnp.stack(rows, axis=3)                    # [B, th, tw, 4, 4, C]


def conv3x3_winograd(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 SAME conv, NHWC/HWIO, bias included — Winograd F(2,3)."""
    n, h, wl, c = x.shape
    co = w.shape[-1]
    th, tw = (h + 1) // 2, (wl + 1) // 2
    # SAME halo (+1 each side) then pad up to the even tile grid:
    # padded plane must cover rows [0, 2*th+2)
    xp = jnp.pad(x, ((0, 0), (1, 1 + (2 * th - h)), (1, 1 + (2 * tw - wl)),
                     (0, 0)))
    d = _tiles_4x4(xp, th, tw)                        # [B,th,tw,4,4,C]

    bt = jnp.asarray(_BT)
    # U = Bᵀ d B on the two tile dims, f32 (transform is additions only)
    u = jnp.einsum("ri,bxyijc,sj->bxyrsc", bt, d.astype(jnp.float32), bt)

    g = jnp.asarray(_G)
    wt = jnp.einsum("ri,ijco,sj->rsco", g, w.astype(jnp.float32), g)

    # 16 independent [B·th·tw, C] × [C, Co] contractions (MXU); bf16
    # operands with f32 accumulation on TPU.  The CPU runtime's dot thunk
    # rejects BF16×BF16→F32, so off-TPU the contraction stays f32.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    mm_dtype = x.dtype if on_tpu else jnp.float32
    m = jnp.einsum("bxyrsc,rsco->bxyrso",
                   u.astype(mm_dtype), wt.astype(mm_dtype),
                   preferred_element_type=jnp.float32)

    at = jnp.asarray(_AT)
    y = jnp.einsum("pr,bxyrso,qs->bxypqo", at, m, at)  # [B,th,tw,2,2,Co]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * th, 2 * tw, co)
    y = y[:, :h, :wl, :] + b.astype(jnp.float32)
    return y.astype(x.dtype)
