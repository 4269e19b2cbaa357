"""FID harness tests."""

import numpy as np
import pytest

from fgdm_tpu.utils.fid import FeatureStats, compute_fid, frechet_distance


def test_feature_stats_match_numpy():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 8))
    s = FeatureStats(8)
    for i in range(0, 500, 100):
        s.update(feats[i:i + 100])
    np.testing.assert_allclose(s.mean, feats.mean(0), atol=1e-10)
    np.testing.assert_allclose(s.cov, np.cov(feats, rowvar=False), atol=1e-8)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(1)
    mu = rng.standard_normal(4)
    a = rng.standard_normal((4, 4))
    sigma = a @ a.T + np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-6)


def test_frechet_distance_gaussian_analytic():
    """For isotropic Gaussians: ‖μ1−μ2‖² + d(σ1−σ2)²."""
    d = 6
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s1, s2 = np.eye(d) * 1.0, np.eye(d) * 4.0
    expected = 4.0 * d + d * (1.0 - 2.0) ** 2
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expected,
                                                               rel=1e-6)


def test_compute_fid_orders_distributions():
    rng = np.random.default_rng(2)

    def fake_extractor(imgs):
        return imgs.reshape(imgs.shape[0], -1)[:, :16]

    real = [rng.normal(0.5, 0.1, (32, 4, 4, 3)) for _ in range(3)]
    close = [rng.normal(0.5, 0.1, (32, 4, 4, 3)) for _ in range(3)]
    far = [rng.normal(0.0, 0.3, (32, 4, 4, 3)) for _ in range(3)]
    fid_close = compute_fid(real, close, fake_extractor, 16)
    fid_far = compute_fid(real, far, fake_extractor, 16)
    assert fid_close < fid_far
