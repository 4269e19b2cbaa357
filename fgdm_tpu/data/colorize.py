"""Vectorized label↔color codecs for semantic maps.

Behavioural contract from `/root/reference/ldm/data/semantic.py:20-83`
(``BatchColorize``/``BatchDeColorize`` + bit-pattern ``color_map``) and the
ADE palette variants (`ldm/data/color_mapping.py:176-177`).  The reference
loops over labels with boolean masks (O(N_labels · H · W)); here both
directions are O(H·W) table lookups — colorize via ``cmap[labels]``,
decolorize via a packed-int24 hash of the palette.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from fgdm_tpu.data.label_tables import ADE_PALETTE, COCO_TO_ADE

__all__ = [
    "color_map",
    "colorize",
    "decolorize",
    "ade_cmap",
    "coco_to_ade_labels",
]


def color_map(n: int = 256) -> np.ndarray:
    """PASCAL-style bit-pattern palette, [n,3] uint8 (semantic.py:64-83)."""
    i = np.arange(n, dtype=np.uint32)
    r = np.zeros(n, np.uint32)
    g = np.zeros(n, np.uint32)
    b = np.zeros(n, np.uint32)
    c = i.copy()
    for j in range(8):
        r |= ((c >> 0) & 1) << (7 - j)
        g |= ((c >> 1) & 1) << (7 - j)
        b |= ((c >> 2) & 1) << (7 - j)
        c >>= 3
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def ade_cmap() -> np.ndarray:
    return np.asarray(ADE_PALETTE, dtype=np.uint8)


def colorize(labels: np.ndarray, cmap: Optional[np.ndarray] = None,
             void_label: int = 255) -> np.ndarray:
    """[...,H,W] int labels → [...,H,W,3] uint8 RGB; void → white."""
    if cmap is None:
        cmap = color_map(max(int(labels.max()) + 1, 1))
    labels = np.asarray(labels)
    safe = np.clip(labels, 0, len(cmap) - 1)
    rgb = cmap[safe]
    void = labels == void_label
    rgb = np.where(void[..., None], np.uint8(255), rgb)
    return rgb


def _pack(rgb: np.ndarray) -> np.ndarray:
    rgb = rgb.astype(np.uint32)
    return (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]


def decolorize(rgb: np.ndarray, cmap: Optional[np.ndarray] = None,
               n: int = 256, void_label: int = 255) -> np.ndarray:
    """[...,H,W,3] uint8 RGB → [...,H,W] int labels; unknown colors → void.

    Exact-match semantics like the reference's BatchDeColorize (pixels not
    matching any palette entry become 255)."""
    if cmap is None:
        cmap = color_map(n)
    packed_palette = _pack(cmap.astype(np.uint32))
    order = np.argsort(packed_palette)
    sorted_pal = packed_palette[order]
    packed = _pack(np.asarray(rgb))
    idx = np.searchsorted(sorted_pal, packed)
    idx = np.clip(idx, 0, len(sorted_pal) - 1)
    matched = sorted_pal[idx] == packed
    labels = np.where(matched, order[idx], void_label)
    return labels.astype(np.int32)


def coco_to_ade_labels(labels: np.ndarray, void_label: int = 255) -> np.ndarray:
    """COCO-stuff class ids → ADE20K ids via the reference mapping table."""
    lut = np.full(256, void_label, dtype=np.int32)
    for k, v in COCO_TO_ADE.items():
        if 0 <= k < 256:
            lut[k] = v
    return lut[np.clip(np.asarray(labels), 0, 255)]


def nearest_palette_decolorize(rgb: np.ndarray, cmap: np.ndarray) -> np.ndarray:
    """Nearest-color decolorize (robust to resize/compression artifacts) —
    used when decoding *generated* condition maps, where exact match fails.
    """
    flat = np.asarray(rgb).reshape(-1, 3).astype(np.int32)
    pal = cmap.astype(np.int32)
    d = np.abs(flat[:, None, :] - pal[None, :, :]).sum(-1)
    labels = d.argmin(1).astype(np.int32)
    return labels.reshape(np.asarray(rgb).shape[:-1])
