"""Fréchet Inception Distance — first-class, *enabled* evaluation.

The reference implements FID (/root/reference/sagan/main.py:39-84) but
(a) keeps it commented out of the training loop (:271-273), (b) draws
fake labels as ``uniform(0,1)`` — always class 0 — and (c) keeps only the
last row of each activation batch (``result[-1]``, :61,76), silently
corrupting the statistics (SURVEY.md Appendix A.9).  This module fixes
all three and is wired into the Trainer via ``fid_epoch_freq``.

Components:
  * exact Fréchet distance |μ₁-μ₂|² + tr(Σ₁+Σ₂-2·(Σ₁Σ₂)^½), with the
    matrix square root via the symmetric-eigendecomposition identity
    tr((Σ₁Σ₂)^½) = Σ √λᵢ(Σ₁^½ Σ₂ Σ₁^½) — numpy-only, no scipy.sqrtm;
  * real-set statistics cached to ``.cache/{dataset}_{size}_{n}.pkl``
    (same cache contract as sagan/main.py:48-66);
  * pluggable feature extractors:
      - ``inception``: InceptionV3 pool features (requires a local
        weights file — this environment has no network egress, so weights
        must be supplied via config['inception_weights']);
      - ``random``: a deterministic randomly-initialized conv network
        (a documented *proxy* metric: random-feature FID still contracts
        as distributions converge and is a valid regression signal, but
        its absolute scale is not comparable to published FID numbers).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Fréchet distance
# --------------------------------------------------------------------------


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians, numerically robust for near-singular
    covariances (trace term via the symmetric product)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    inner = s1_half @ sigma2 @ s1_half
    vals = np.clip(np.linalg.eigvalsh(inner), 0.0, None)
    tr_sqrt = float(np.sum(np.sqrt(vals)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_sqrt)


def activation_stats(acts: np.ndarray):
    acts = np.asarray(acts, np.float64)
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


# --------------------------------------------------------------------------
# feature extractors
# --------------------------------------------------------------------------


class RandomConvFeatures:
    """Deterministic random conv features (proxy extractor).

    4 stride-2 conv + leaky-relu stages then global mean/std pooling,
    fixed PRNG seed — identical across runs and hosts.
    """

    def __init__(self, img_size: int, dim: int = 256, seed: int = 42):
        self.img_size = img_size
        self.dim = dim
        self.cache_tag = f"random{dim}s{seed}"
        key = jax.random.PRNGKey(seed)
        chans = [3, 32, 64, 128, dim // 2]
        self.kernels = []
        for i in range(4):
            key, k = jax.random.split(key)
            fan_in = 3 * 3 * chans[i]
            w = jax.random.normal(
                k, (3, 3, chans[i], chans[i + 1])) * np.sqrt(2.0 / fan_in)
            self.kernels.append(w)
        self._fwd = jax.jit(self._forward)

    def _forward(self, x):
        # x: [B,H,W,3] in [-1,1]
        for w in self.kernels:
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.leaky_relu(x, 0.2)
        mean = jnp.mean(x, axis=(1, 2))
        std = jnp.std(x, axis=(1, 2))
        return jnp.concatenate([mean, std], axis=-1)

    def __call__(self, images) -> np.ndarray:
        return np.asarray(jax.device_get(self._fwd(jnp.asarray(images))))


def get_extractor(config: dict):
    """Build the FID feature extractor.  The returned object carries a
    ``backend`` attribute ("inception" or "random_proxy") naming what
    was ACTUALLY instantiated — report that, not the config intent,
    because a configured-but-missing ``inception_weights`` under
    ``fid_extractor='auto'`` silently falls back to the proxy."""
    kind = config.get("fid_extractor", "auto")
    weights = config.get("inception_weights")
    if kind in ("inception", "auto") and weights and os.path.exists(weights):
        from .inception import InceptionV3Features
        ext = InceptionV3Features(weights)
        ext.backend = "inception"
        return ext
    if kind == "inception":
        raise FileNotFoundError(
            "fid_extractor='inception' needs config['inception_weights'] "
            "pointing at a local weights file (no network egress here)")
    if weights and kind == "auto":  # configured but unusable: be loud
        # (an explicit fid_extractor='random' with a valid weights file
        # kept for IS is a deliberate choice, not a fallback — no warning)
        print(f"WARNING: inception_weights={weights!r} does not exist; "
              f"falling back to the random-feature PROXY extractor — the "
              f"resulting FID is not comparable to published numbers",
              flush=True)
    ext = RandomConvFeatures(config["img_size"],
                             dim=config.get("fid_feature_dim", 256))
    ext.backend = "random_proxy"
    return ext


# --------------------------------------------------------------------------
# end-to-end FID
# --------------------------------------------------------------------------


def real_stats(dataset, extractor, num_images: int, cache_file: str | None):
    if cache_file and os.path.isfile(cache_file):
        with open(cache_file, "rb") as f:
            return pickle.load(f, encoding="latin1")
    acts = []
    seen = 0
    epoch = 0
    while seen < num_images:
        seen_before = seen
        for images_u8, _labels in dataset.epoch(epoch):
            x = images_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
            acts.append(extractor(x))
            seen += x.shape[0]
            if seen >= num_images:
                break
        if seen == seen_before:
            # an epoch that yields nothing (per-host records < batch
            # size) would spin this loop forever
            raise ValueError(
                f"dataset produced no batches in epoch {epoch} — cannot "
                f"accumulate {num_images} real images for FID (dataset "
                f"smaller than one batch?)")
        epoch += 1
    acts = np.concatenate(acts)[:num_images]
    stats = activation_stats(acts)
    if cache_file:
        os.makedirs(os.path.dirname(cache_file) or ".", exist_ok=True)
        # atomic publish: concurrent writers (or a crash mid-dump) must
        # never leave a torn pickle that poisons every later run
        tmp = f"{cache_file}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(stats, f)
        os.replace(tmp, cache_file)
    return stats


def fake_stats(sample_batch_fn, extractor, num_images: int, batch_size: int,
               key):
    """sample_batch_fn(key, n) -> float images [n,H,W,3] in [-1,1]."""
    acts = []
    for begin in range(0, num_images, batch_size):
        n = min(batch_size, num_images - begin)
        key, sub = jax.random.split(key)
        # always sample a full batch and slice: a remainder-sized call
        # would retrace the jitted sampler + extractor for a one-off
        # shape (40-300 s of remote compile per new program on this
        # backend — same pattern as generate.sample_images)
        imgs = sample_batch_fn(sub, batch_size)
        acts.append(extractor(np.asarray(jax.device_get(imgs)))[:n])
    acts = np.concatenate(acts)[:num_images]
    return activation_stats(acts)


def compute_fid(dataset, sample_batch_fn, config, num_images: int = 5000,
                batch_size: int = 64, seed: int = 0,
                extractor=None) -> float:
    if extractor is None:
        extractor = get_extractor(config)
    name = config.get("dataset")
    if not name:
        # no dataset name: derive one from the data location, or two
        # different datasets evaluated from the same working directory
        # would silently share cached real statistics
        import hashlib
        path = os.path.abspath(str(config.get("data_path", "data")))
        name = "data_" + hashlib.sha1(path.encode()).hexdigest()[:10]
    # The cache key must encode the extractor identity: the reference had
    # one fixed extractor (sagan/main.py:48-66) so its `{name}_{size}_{n}`
    # contract was safe; with pluggable extractors a key that omits it
    # would silently reuse proxy-feature statistics for inception FID.
    # Key also encodes the data view (truncation + shuffle seed — the
    # first num_images drawn from epoch 0 depend on both) and, in
    # multi-process runs, the process index: each host's loader serves
    # a DIFFERENT shard, so per-host stats must not share a cache entry.
    view = f"d{config.get('data_size', -1)}s{config.get('data_seed', 0)}"
    if jax.process_count() > 1:
        view += f"_p{jax.process_index()}"
    cache_file = os.path.join(
        ".cache",
        f"{name}_{config['img_size']}_{num_images}_{view}_"
        f"{extractor.cache_tag}.pkl")
    mu_r, s_r = real_stats(dataset, extractor, num_images, cache_file)
    mu_f, s_f = fake_stats(sample_batch_fn, extractor, num_images,
                           batch_size, jax.random.PRNGKey(seed))
    return frechet_distance(mu_f, s_f, mu_r, s_r)


def compute_fid_for_trainer(trainer, num_images: int | None = None,
                            extractor=None) -> float:
    config = trainer.config
    num_images = num_images or config.get("fid_num_images", 5000)
    z_dim = config["z_dim"]
    num_classes = max(1, config.get("num_classes", 1))

    eval_vars = trainer.eval_vars_g()

    def sample_batch(key, n):
        kz, kl = jax.random.split(key)
        z = jax.random.normal(kz, (n, z_dim))
        labels = jax.random.randint(kl, (n,), 0, num_classes)
        return trainer.sample_fn(eval_vars, z, labels)

    return compute_fid(trainer.ds_train, sample_batch, config,
                       num_images=num_images,
                       batch_size=config.get("batch_size", 64),
                       extractor=extractor)
