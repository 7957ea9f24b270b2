"""Inception Score — the upstream SAGAN paper's second headline metric
(arXiv:1805.08318 Table 1: IS 52.52 at ImageNet-128).

The reference repo computes neither FID (disabled in its loop,
/root/reference/sagan/main.py:271-273) nor IS; this module completes the
paper's evaluation suite.  IS = exp(E_x KL(p(y|x) || p(y))), reported as
mean ± std over ``splits`` equal partitions (Salimans et al. 2016
protocol).

Classifier backends mirror fid.py's extractor plumbing:
  * ``inception``: the JAX InceptionV3 port with the exported 1000-way
    top (``export_weights_npz(include_top=True)``) — standard IS;
  * ``random``: a deterministic random-feature classifier (a *proxy*:
    its absolute scale is meaningless, but it is a stable regression
    signal in this egress-free environment, same rationale as the FID
    proxy extractor).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .fid import RandomConvFeatures


def inception_score_from_probs(probs: np.ndarray, splits: int = 10):
    """IS over a [N, C] class-probability matrix → (mean, std)."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for part in np.array_split(np.arange(n), min(splits, n)):
        p = probs[part]
        marginal = p.mean(axis=0, keepdims=True)
        kl = np.sum(p * (np.log(p + 1e-16) - np.log(marginal + 1e-16)),
                    axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


class RandomFeatureClassifier:
    """Proxy classifier: the deterministic random conv trunk + a fixed
    random softmax head.  Same seed discipline as RandomConvFeatures."""

    def __init__(self, img_size: int, num_classes: int = 1000,
                 dim: int = 256, seed: int = 42):
        self.trunk = RandomConvFeatures(img_size, dim=dim, seed=seed)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        self.w = jax.random.normal(key, (dim, num_classes)) / np.sqrt(dim)
        self.cache_tag = f"{self.trunk.cache_tag}_cls{num_classes}"
        self._head = jax.jit(
            lambda f, w: jax.nn.softmax(f @ w * 4.0, axis=-1))

    def __call__(self, images) -> np.ndarray:
        feats = jnp.asarray(self.trunk(images))
        return np.asarray(jax.device_get(self._head(feats, self.w)))


def get_classifier(config: dict):
    """Build the IS classifier.  The returned object carries a
    ``backend`` attribute naming what was ACTUALLY instantiated
    ("inception" or "random_proxy") — callers reporting results must use
    it rather than inferring from config, because a configured-but-
    unusable ``inception_weights`` silently falls back to the proxy."""
    weights = config.get("inception_weights")
    if weights:
        usable = False
        if os.path.exists(weights):
            try:
                # guarded: a truncated/corrupt npz must take the
                # documented proxy fallback, not kill the training run
                # at IS time; close the NpzFile handle either way
                with np.load(weights) as npz:
                    usable = "top_w" in npz
            except Exception as ex:
                print(f"WARNING: inception_weights={weights!r} is "
                      f"unreadable ({type(ex).__name__}: {ex})",
                      flush=True)
        if usable:
            from .inception import InceptionV3Classifier
            cls = InceptionV3Classifier(weights)
            cls.backend = "inception"
            return cls
        print(f"WARNING: inception_weights={weights!r} is missing, "
              f"unreadable, or has no classifier top (top_w); falling "
              f"back to the random-feature PROXY classifier — the "
              f"resulting IS is not comparable to published Inception "
              f"Scores", flush=True)
    cls = RandomFeatureClassifier(config["img_size"])
    cls.backend = "random_proxy"
    return cls


def inception_score(sample_batch_fn, config, num_images: int = 5000,
                    batch_size: int = 64, splits: int = 10, seed: int = 0,
                    classifier=None):
    """IS of generated samples.  ``sample_batch_fn(key, n)`` → float
    images [n, H, W, 3] in [-1, 1] (same contract as fid.fake_stats)."""
    if classifier is None:
        classifier = get_classifier(config)
    key = jax.random.PRNGKey(seed)
    probs = []
    for begin in range(0, num_images, batch_size):
        n = min(batch_size, num_images - begin)
        key, sub = jax.random.split(key)
        # always sample a full batch and slice: a remainder-sized call
        # (5000 % 64 = 8) would retrace the jitted sampler + classifier
        # for a one-off shape — 40-300 s of remote compile per new
        # program on this backend (same pattern as fid.fake_stats)
        imgs = sample_batch_fn(sub, batch_size)
        probs.append(classifier(np.asarray(jax.device_get(imgs)))[:n])
    probs = np.concatenate(probs)[:num_images]
    return inception_score_from_probs(probs, splits)


def inception_score_for_trainer(trainer, num_images: int | None = None,
                                classifier=None):
    config = trainer.config
    num_images = num_images or config.get("is_num_images",
                                          config.get("fid_num_images", 5000))
    z_dim = config["z_dim"]
    num_classes = max(1, config.get("num_classes", 1))
    eval_vars = trainer.eval_vars_g()

    def sample_batch(key, n):
        kz, kl = jax.random.split(key)
        z = jax.random.normal(kz, (n, z_dim))
        labels = jax.random.randint(kl, (n,), 0, num_classes)
        return trainer.sample_fn(eval_vars, z, labels)

    return inception_score(sample_batch, config, num_images=num_images,
                           batch_size=config.get("batch_size", 64),
                           classifier=classifier)
