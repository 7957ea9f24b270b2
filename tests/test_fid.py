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
    covmean = scipy_linalg.sqrtm(s1 @ s2)
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
    # cache key includes the extractor identity (kind+dim+seed) and the
    # data view (truncation + shuffle seed)
    assert (tmp_path / ".cache"
            / "synthA_16_96_d-1s0_random64s42.pkl").exists()


def test_fid_cache_keyed_by_extractor(tmp_path, monkeypatch):
    """Switching feature extractors must NOT reuse cached real-set stats:
    the full inception path (tf.keras random weights -> export npz ->
    compute_fid with caching) runs end-to-end, then the proxy extractor
    runs on the same dataset and each gets its own cache entry
    (cache contract of /root/reference/sagan/main.py:39-84, extended for
    pluggable extractors)."""
    tf = pytest.importorskip("tensorflow")
    from sagan_tpu.data.loader import ImageDataset
    from sagan_tpu.data.synthetic import make_synthetic_dataset
    from sagan_tpu.train.inception import export_weights_npz

    monkeypatch.chdir(tmp_path)
    d = make_synthetic_dataset(str(tmp_path / "ds"), num=48, img_size=16,
                               num_classes=2)
    ds = ImageDataset(d, batch_size=16, shuffle_buffer=1)

    npz = str(tmp_path / "incep.npz")
    model = tf.keras.applications.InceptionV3(
        include_top=False, weights=None, input_shape=(299, 299, 3))
    export_weights_npz(npz, source=model)

    def sampler(key, n):
        return np.random.default_rng(int(key[0]) % 2**31).uniform(
            -1, 1, (n, 16, 16, 3)).astype(np.float32)

    cfg_incep = {"img_size": 16, "dataset": "synthB",
                 "inception_weights": npz}
    fid_i = compute_fid(ds, sampler, cfg_incep, num_images=32,
                        batch_size=16)
    assert np.isfinite(fid_i) and fid_i > 0

    cfg_proxy = {"img_size": 16, "dataset": "synthB",
                 "fid_feature_dim": 64}
    fid_p = compute_fid(ds, sampler, cfg_proxy, num_images=32,
                        batch_size=16)
    assert np.isfinite(fid_p) and fid_p > 0

    cache = sorted(f.name for f in (tmp_path / ".cache").iterdir())
    incep_files = [f for f in cache if "inception" in f]
    proxy_files = [f for f in cache if "random" in f]
    assert len(incep_files) == 1 and len(proxy_files) == 1
    # second run with the inception config hits its own cache (no growth)
    fid_i2 = compute_fid(ds, sampler, cfg_incep, num_images=32,
                         batch_size=16)
    assert len(list((tmp_path / ".cache").iterdir())) == 2
    assert np.isfinite(fid_i2)
