"""FID math + machinery tests (the reference's FID was disabled and
statistically broken — SURVEY.md Appendix A.9)."""

import numpy as np
import pytest

from sagan_tpu.train.fid import (RandomConvFeatures, activation_stats,
                                 compute_fid, frechet_distance)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(500, 16))
    mu, sigma = activation_stats(acts)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_distance_mean_shift_analytic():
    # equal covariance I, means differing by d: FID = |d|^2
    n = 8
    mu1, mu2 = np.zeros(n), np.full(n, 0.5)
    eye = np.eye(n)
    np.testing.assert_allclose(frechet_distance(mu1, eye, mu2, eye),
                               n * 0.25, rtol=1e-10)


def test_frechet_distance_variance_analytic():
    # 1-D gaussians N(0,1) vs N(0,4): (sigma1-sigma2)^2 = (1-2)^2 = 1
    d = frechet_distance(np.zeros(1), np.eye(1), np.zeros(1),
                         4 * np.eye(1))
    np.testing.assert_allclose(d, 1.0, rtol=1e-10)


def test_frechet_matches_scipy_sqrtm():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(1)
    a1 = rng.normal(size=(200, 6))
    a2 = rng.normal(size=(200, 6)) * 1.5 + 0.3
    mu1, s1 = activation_stats(a1)
    mu2, s2 = activation_stats(a2)
    ours = frechet_distance(mu1, s1, mu2, s2)
    covmean, _ = scipy_linalg.sqrtm(s1 @ s2, disp=False)
    ref = (np.sum((mu1 - mu2) ** 2) + np.trace(s1 + s2 - 2 * covmean.real))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_random_extractor_deterministic_and_discriminative():
    ex = RandomConvFeatures(img_size=16, dim=64)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    f1, f2 = ex(x), ex(x)
    np.testing.assert_allclose(f1, f2, atol=2e-5)
    assert f1.shape == (8, 64)
    # different distributions -> different stats
    y = np.clip(x * 0.1 + 0.8, -1, 1)
    fy = ex(y)
    assert np.abs(f1.mean(0) - fy.mean(0)).max() > 1e-3


def test_compute_fid_smaller_for_matching_distribution(tmp_path, monkeypatch):
    """FID(real-like samples) << FID(noise samples)."""
    from sagan_tpu.data.loader import ImageDataset
    from sagan_tpu.data.synthetic import make_synthetic_dataset, \
        synthetic_images

    monkeypatch.chdir(tmp_path)
    d = make_synthetic_dataset(str(tmp_path / "ds"), num=128, img_size=16,
                               num_classes=4)
    ds = ImageDataset(d, batch_size=32, shuffle_buffer=1)
    config = {"img_size": 16, "dataset": "synthA", "fid_feature_dim": 64}

    import itertools
    pool = [img for img, _ in synthetic_images(128, 16, 4, seed=99)]
    pool = np.stack(pool).astype(np.float32) * (2 / 255) - 1

    def good_sampler(key, n):
        idx = np.random.default_rng(int(key[0]) % 2**31).integers(
            0, len(pool), n)
        return pool[idx]

    def noise_sampler(key, n):
        return np.random.default_rng(int(key[0]) % 2**31).uniform(
            -1, 1, (n, 16, 16, 3)).astype(np.float32)

    fid_good = compute_fid(ds, good_sampler, config, num_images=96,
                           batch_size=32)
    config2 = dict(config, dataset="synthA")  # reuse cache
    fid_noise = compute_fid(ds, noise_sampler, config2, num_images=96,
                            batch_size=32)
    assert fid_good < fid_noise * 0.5
    assert (tmp_path / ".cache" / "synthA_16_96.pkl").exists()
