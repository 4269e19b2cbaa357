"""Canny edge annotator.

Mirrors `/root/reference/controlnet/annotator/canny/__init__.py:4-6` (a
cv2.Canny wrapper) and adds a pure-JAX batched Sobel-magnitude variant that
can run inside a traced program (cv2 requires a host round trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class CannyDetector:
    """Host-side exact Canny (cv2), uint8 HWC in/out."""

    def __call__(self, img: np.ndarray, low_threshold: int = 100,
                 high_threshold: int = 200) -> np.ndarray:
        import cv2

        return cv2.Canny(np.asarray(img), low_threshold, high_threshold)


_SOBEL_X = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def sobel_edges(img: jnp.ndarray, threshold: float = 0.25) -> jnp.ndarray:
    """In-graph edge map: [B,H,W,C] in [-1,1] → [B,H,W,1] binary {0,1}.

    Device-side approximation of Canny (gradient magnitude + threshold,
    no hysteresis) for fused condition synthesis.
    """
    gray = jnp.mean(img.astype(jnp.float32), axis=-1, keepdims=True)
    k = jnp.stack([_SOBEL_X, _SOBEL_Y], axis=-1)[:, :, None, :]  # HWIO
    g = jax.lax.conv_general_dilated(
        gray, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    mag = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    mag = mag / (jnp.max(mag, axis=(1, 2, 3), keepdims=True) + 1e-8)
    return (mag > threshold).astype(jnp.float32)
