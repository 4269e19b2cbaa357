"""Fréchet-distance evaluation harness (FID-style, clean-fid conventions).

The reference evaluates with clean-fid + CLIP score offline (SURVEY §4,
`utils/clip_utils.py`).  This module provides the in-repo equivalent:
feature-statistic accumulation over batches, the Fréchet distance
``‖μ₁−μ₂‖² + Tr(Σ₁+Σ₂−2(Σ₁Σ₂)^{1/2})``, and two feature backends: a
CLIP extractor (CLIP-FID) here, and the standard InceptionV3 pool3
backend in :mod:`fgdm_tpu.utils.inception` (FID-variant architecture +
torch-checkpoint ingest; any [B,H,W,3]→[B,D] extractor plugs in).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


class FeatureStats:
    """Streaming mean/covariance accumulator for feature batches."""

    def __init__(self, dim: int):
        self.dim = dim
        self.n = 0
        self._sum = np.zeros(dim, np.float64)
        self._outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        assert feats.ndim == 2 and feats.shape[1] == self.dim
        self.n += feats.shape[0]
        self._sum += feats.sum(0)
        self._outer += feats.T @ feats

    @property
    def mean(self) -> np.ndarray:
        return self._sum / max(self.n, 1)

    @property
    def cov(self) -> np.ndarray:
        mu = self.mean
        return self._outer / max(self.n - 1, 1) - np.outer(mu, mu) * (
            self.n / max(self.n - 1, 1)
        )


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID formula with the standard numerical guards."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
    dim: int,
) -> float:
    """Images in [0,1] [B,H,W,3] → Fréchet distance over feature_fn."""
    s_real, s_fake = FeatureStats(dim), FeatureStats(dim)
    for b in real_batches:
        s_real.update(np.asarray(feature_fn(b)))
    for b in fake_batches:
        s_fake.update(np.asarray(feature_fn(b)))
    return frechet_distance(s_real.mean, s_real.cov, s_fake.mean, s_fake.cov)


def clip_feature_fn(scorer) -> Tuple[Callable, int]:
    """Feature backend from a `fgdm_tpu.utils.clip_score.CLIPScorer`
    (CLIP-FID)."""
    import jax.numpy as jnp

    def fn(img01: np.ndarray) -> np.ndarray:
        return np.asarray(scorer._encode_image(
            scorer.vision_params, jnp.asarray(img01)))

    return fn, scorer.vision_def.proj_dim
