"""Tiled (patch-split) inference for large inputs.

Re-design of the reference's fold/unfold machinery
(`/root/reference/ldm/models/diffusion/ddpm.py:697-763,841-989` —
``split_input_params`` with border-weighted stitching): inputs beyond the
trained resolution are processed as overlapping tiles and blended back with
a smooth weight window.  The torch version builds fold/unfold index ops per
call; here tiles are gathered with static slices (batched through the model
in one call — good MXU utilization) and blended by pre-computed weights, all
inside jit.

On TPU the preferred path for >1024² generation is sharding the token axis
across the mesh (SURVEY §5 long-context note); tiling remains useful for
single-chip VAE encode/decode of very large images.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _tile_starts(size: int, tile: int, stride: int):
    starts = list(range(0, max(size - tile, 0) + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return starts


def _smooth_window(tile: int, clip_min: float = 0.01) -> np.ndarray:
    """Separable border-falloff window (reference ``get_weighting`` with
    clipped normal falloff, ddpm.py:697-712)."""
    x = (np.arange(tile) - (tile - 1) / 2) / tile
    w = np.exp(-8.0 * x * x)
    w = np.clip(w, clip_min, None)
    return w


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    tile: int,
    stride: int,
    out_scale: int = 1,
) -> jnp.ndarray:
    """Apply ``fn`` ([B,tile,tile,Cin] → [B,tile*s,tile*s,Cout]) over
    overlapping tiles of ``x`` and blend.

    ``out_scale`` handles resolution-changing fns (VAE encode 1/8 →
    out_scale is fractional? use encode with scale<1 via rational support:
    pass e.g. 0.125 as 1/8 — any value where tile*s and stride*s are
    integers works).
    """
    b, h, w, _ = x.shape
    ys = _tile_starts(h, tile, stride)
    xs = _tile_starts(w, tile, stride)

    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(
                jax.lax.dynamic_slice_in_dim(
                    jax.lax.dynamic_slice_in_dim(x, y0, tile, axis=1),
                    x0, tile, axis=2,
                )
            )
    batched = jnp.concatenate(tiles, axis=0)      # [T*B, tile, tile, C]
    outs = fn(batched)
    ot = outs.shape[1]
    s = ot / tile
    assert abs(s - out_scale) < 1e-6 or out_scale == 1, (ot, tile, out_scale)

    oh = int(round(h * s))
    ow = int(round(w * s))
    cout = outs.shape[-1]
    win1d = _smooth_window(ot)
    win = jnp.asarray(np.outer(win1d, win1d), jnp.float32)[None, :, :, None]

    acc = jnp.zeros((b, oh, ow, cout), jnp.float32)
    norm = jnp.zeros((b, oh, ow, 1), jnp.float32)
    idx = 0
    for y0 in ys:
        for x0 in xs:
            t = outs[idx * b:(idx + 1) * b].astype(jnp.float32) * win
            oy = int(round(y0 * s))
            ox = int(round(x0 * s))
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (0, oy, ox, 0), (b, ot, ot, cout)
                ) + t,
                (0, oy, ox, 0),
            )
            norm = jax.lax.dynamic_update_slice(
                norm,
                jax.lax.dynamic_slice(norm, (0, oy, ox, 0), (b, ot, ot, 1))
                + win,
                (0, oy, ox, 0),
            )
            idx += 1
    return (acc / norm).astype(outs.dtype)


def tiled_decode(ld, z: jnp.ndarray, tile: int = 64,
                 overlap: int = 16) -> jnp.ndarray:
    """VAE-decode large latents tile-by-tile (f=8 upscale)."""
    return tiled_apply(
        lambda zz: ld.decode_first_stage(zz), z, tile, tile - overlap,
        out_scale=8,
    )


def tiled_encode(ld, img: jnp.ndarray, tile: int = 512,
                 overlap: int = 128) -> jnp.ndarray:
    """VAE-encode large images tile-by-tile (f=8 downscale)."""
    return tiled_apply(
        lambda ii: ld.encode_first_stage(ii), img, tile, tile - overlap,
        out_scale=1,  # fractional 1/8 validated inside by shape
    )
