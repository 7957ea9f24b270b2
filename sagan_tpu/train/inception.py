"""InceptionV3 feature extractor in JAX — the real-FID backbone.

The reference computes FID activations with
``tf.keras.applications.InceptionV3(include_top=False)``
(/root/reference/sagan/main.py:45).  This is a from-scratch JAX port of
that architecture (conv/BN stem + mixed0..mixed10 inception blocks,
2048-dim global-average-pooled features) that loads weights from an
``.npz`` produced by ``export_weights_npz`` (which can read either a
live tf.keras model or a Keras ``.h5`` file).

Weight mapping is by *creation order*: Keras instantiates its Conv2D and
BatchNormalization layers in the exact order the forward graph is
written, and this port replays the same order, so ``conv_i`` /
``bn_i`` indices line up one-to-one.  The correspondence is verified in
tests by round-tripping a randomly initialized tf.keras InceptionV3
through the exporter and comparing activations (no pretrained weights
exist in this egress-free environment; with a real ``imagenet`` h5 the
same path yields standard FID).

All convs are bias-free; BN is scale-free (gamma≡1), eps 1e-3, relu —
matching ``keras.applications.inception_v3.conv2d_bn``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.util import matmul_precision


# --------------------------------------------------------------------------
# forward graph
# --------------------------------------------------------------------------


class _P:
    """Sequential parameter cursor (creation-order weight mapping)."""

    def __init__(self, params):
        self.params = params
        self.i = 0

    def next(self):
        p = self.params[self.i]
        self.i += 1
        return p


def _fingerprint(path: str) -> str:
    """First-MB sha1 of the weights file — keys FID/IS stat caches to
    the weight bytes (shared by both extractor classes so their tag
    schemes cannot drift apart)."""
    import hashlib
    with open(path, "rb") as f:
        return hashlib.sha1(f.read(1 << 20)).hexdigest()[:8]


def _conv_bn(p: _P, x, strides=(1, 1), padding="SAME"):
    unit = p.next()
    w = unit["kernel"]
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # fp32 features must not silently demote to bf16 passes on this
        # TPU toolchain (CLAUDE.md) — FID/IS features feed statistics
        precision=matmul_precision(x.dtype))
    x = (x - unit["mean"]) * lax.rsqrt(unit["var"] + 1e-3) + unit["beta"]
    return jax.nn.relu(x)


def _pool(x, kind, window=3, strides=1, padding="SAME"):
    if kind == "max":
        init, op = -jnp.inf, lax.max
    else:
        init, op = 0.0, lax.add
    out = lax.reduce_window(x, init, op,
                            (1, window, window, 1),
                            (1, strides, strides, 1), padding)
    if kind == "avg":
        ones = jnp.ones_like(x[..., :1])
        denom = lax.reduce_window(ones, 0.0, lax.add,
                                  (1, window, window, 1),
                                  (1, strides, strides, 1), padding)
        out = out / denom
    return out


def inception_v3_features(params: list, x: jax.Array) -> jax.Array:
    """x: [B,H,W,3] in [-1,1] → [B,2048] pooled features."""
    p = _P(params)
    cat = functools.partial(jnp.concatenate, axis=-1)

    # stem
    x = _conv_bn(p, x, strides=(2, 2), padding="VALID")      # 32 3x3/2 v
    x = _conv_bn(p, x, padding="VALID")                      # 32 3x3 v
    x = _conv_bn(p, x)                                       # 64 3x3
    x = _pool(x, "max", 3, 2, "VALID")
    x = _conv_bn(p, x, padding="VALID")                      # 80 1x1 v
    x = _conv_bn(p, x, padding="VALID")                      # 192 3x3 v
    x = _pool(x, "max", 3, 2, "VALID")

    # mixed 0..2: 35x35
    for _ in range(3):
        b1 = _conv_bn(p, x)                                  # 64 1x1
        b5 = _conv_bn(p, x)                                  # 48 1x1
        b5 = _conv_bn(p, b5)                                 # 64 5x5
        b3 = _conv_bn(p, x)                                  # 64 1x1
        b3 = _conv_bn(p, b3)                                 # 96 3x3
        b3 = _conv_bn(p, b3)                                 # 96 3x3
        bp = _pool(x, "avg", 3, 1, "SAME")
        bp = _conv_bn(p, bp)                                 # 32/64/64 1x1
        x = cat([b1, b5, b3, bp])

    # mixed 3: 17x17
    b3 = _conv_bn(p, x, strides=(2, 2), padding="VALID")     # 384 3x3/2 v
    bd = _conv_bn(p, x)                                      # 64 1x1
    bd = _conv_bn(p, bd)                                     # 96 3x3
    bd = _conv_bn(p, bd, strides=(2, 2), padding="VALID")    # 96 3x3/2 v
    bp = _pool(x, "max", 3, 2, "VALID")
    x = cat([b3, bd, bp])

    # mixed 4..7
    for _ in range(4):
        b1 = _conv_bn(p, x)                                  # 192 1x1
        b7 = _conv_bn(p, x)                                  # c 1x1
        b7 = _conv_bn(p, b7)                                 # c 1x7
        b7 = _conv_bn(p, b7)                                 # 192 7x1
        bd = _conv_bn(p, x)                                  # c 1x1
        bd = _conv_bn(p, bd)                                 # c 7x1
        bd = _conv_bn(p, bd)                                 # c 1x7
        bd = _conv_bn(p, bd)                                 # c 7x1
        bd = _conv_bn(p, bd)                                 # 192 1x7
        bp = _pool(x, "avg", 3, 1, "SAME")
        bp = _conv_bn(p, bp)                                 # 192 1x1
        x = cat([b1, b7, bd, bp])

    # mixed 8: 8x8
    b3 = _conv_bn(p, x)                                      # 192 1x1
    b3 = _conv_bn(p, b3, strides=(2, 2), padding="VALID")    # 320 3x3/2 v
    b7 = _conv_bn(p, x)                                      # 192 1x1
    b7 = _conv_bn(p, b7)                                     # 192 1x7
    b7 = _conv_bn(p, b7)                                     # 192 7x1
    b7 = _conv_bn(p, b7, strides=(2, 2), padding="VALID")    # 192 3x3/2 v
    bp = _pool(x, "max", 3, 2, "VALID")
    x = cat([b3, b7, bp])

    # mixed 9..10
    for _ in range(2):
        b1 = _conv_bn(p, x)                                  # 320 1x1
        b3 = _conv_bn(p, x)                                  # 384 1x1
        b3a = _conv_bn(p, b3)                                # 384 1x3
        b3b = _conv_bn(p, b3)                                # 384 3x1
        b3 = cat([b3a, b3b])
        bd = _conv_bn(p, x)                                  # 448 1x1
        bd = _conv_bn(p, bd)                                 # 384 3x3
        bda = _conv_bn(p, bd)                                # 384 1x3
        bdb = _conv_bn(p, bd)                                # 384 3x1
        bd = cat([bda, bdb])
        bp = _pool(x, "avg", 3, 1, "SAME")
        bp = _conv_bn(p, bp)                                 # 192 1x1
        x = cat([b1, b3, bd, bp])

    assert p.i == len(params), (p.i, len(params))
    return jnp.mean(x, axis=(1, 2))  # global average pool → [B, 2048]


NUM_UNITS = 94  # conv/bn pairs in InceptionV3


# --------------------------------------------------------------------------
# weight import/export
# --------------------------------------------------------------------------


def export_weights_npz(out_path: str, source=None,
                       include_top: bool = False) -> None:
    """Dump InceptionV3 conv/BN weights to npz in creation order.

    ``source``: a tf.keras Model, a Keras ``.h5`` weights path, or None
    (builds ``tf.keras.applications.InceptionV3(weights='imagenet')`` —
    requires network access or a cached download).

    ``include_top=True`` additionally exports the 1000-way classifier
    Dense (``top_w``/``top_b``) — needed for Inception Score (the
    upstream SAGAN paper's second metric, arXiv:1805.08318 Table 1;
    the reference computes neither metric in practice).
    """
    import tensorflow as tf  # tooling-only dependency

    if source is None or isinstance(source, str):
        weights = "imagenet" if source is None else None
        model = tf.keras.applications.InceptionV3(
            include_top=include_top, weights=weights,
            input_shape=(299, 299, 3) if not include_top else None)
        if isinstance(source, str):
            model.load_weights(source)
    else:
        model = source

    def _index(name: str) -> int:
        # keras auto-names in creation order: 'conv2d', 'conv2d_1', ...
        tail = name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else 0

    convs, bns = [], []
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.Conv2D):
            convs.append((_index(layer.name), layer.kernel.numpy()))
        elif isinstance(layer, tf.keras.layers.BatchNormalization):
            beta, mean, var = [w.numpy() for w in layer.weights]
            bns.append((_index(layer.name), (beta, mean, var)))
    # model.layers is topologically sorted, NOT creation-ordered; the
    # name index recovers creation order, which is what the JAX forward
    # replays.
    convs = [k for _, k in sorted(convs, key=lambda t: t[0])]
    bns = [b for _, b in sorted(bns, key=lambda t: t[0])]
    assert len(convs) == len(bns) == NUM_UNITS, (len(convs), len(bns))

    out = {}
    for i, (k, (beta, mean, var)) in enumerate(zip(convs, bns)):
        out[f"kernel_{i}"] = k
        out[f"beta_{i}"] = beta
        out[f"mean_{i}"] = mean
        out[f"var_{i}"] = var
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.Dense):  # classifier top
            out["top_w"] = layer.kernel.numpy()
            out["top_b"] = layer.bias.numpy()
    np.savez(out_path, **out)


def load_weights_npz(path: str) -> list:
    data = np.load(path)
    params = []
    for i in range(NUM_UNITS):
        params.append({
            "kernel": jnp.asarray(data[f"kernel_{i}"]),
            "beta": jnp.asarray(data[f"beta_{i}"]),
            "mean": jnp.asarray(data[f"mean_{i}"]),
            "var": jnp.asarray(data[f"var_{i}"]),
        })
    return params


# --------------------------------------------------------------------------
# extractor facade for fid.py
# --------------------------------------------------------------------------


class InceptionV3Features:
    """FID feature extractor: resize to 299 (standard FID protocol;
    configurable), InceptionV3 forward, 2048-dim pooled features."""

    def __init__(self, weights_path: str, resize_to: int = 299):
        self.params = load_weights_npz(weights_path)
        self.resize_to = resize_to
        # cache identity: extractor kind + a fingerprint of the weights
        # file, so FID stat caches keyed on this tag never mix weights
        self.cache_tag = (
            f"inception{resize_to}_{_fingerprint(weights_path)}")

        @jax.jit
        def fwd(params, x):
            if resize_to and (x.shape[1] != resize_to
                              or x.shape[2] != resize_to):
                x = jax.image.resize(
                    x, (x.shape[0], resize_to, resize_to, 3), "bilinear")
            return inception_v3_features(params, x)

        self._fwd = fwd

    def __call__(self, images) -> np.ndarray:
        x = jnp.asarray(images, jnp.float32)
        return np.asarray(jax.device_get(self._fwd(self.params, x)))


class InceptionV3Classifier:
    """Inception-Score backbone: resize → InceptionV3 features → the
    exported 1000-way classifier Dense → class probabilities [B, 1000].

    Requires an npz exported with ``export_weights_npz(include_top=True)``
    (``top_w``/``top_b`` present); the feature trunk is the same
    creation-order port the FID extractor uses.
    """

    def __init__(self, weights_path: str, resize_to: int = 299):
        self.params = load_weights_npz(weights_path)
        data = np.load(weights_path)
        if "top_w" not in data:
            raise ValueError(
                f"{weights_path} has no classifier top — re-export with "
                f"export_weights_npz(include_top=True)")
        top = (jnp.asarray(data["top_w"]), jnp.asarray(data["top_b"]))
        self.cache_tag = (
            f"inception_cls{resize_to}_{_fingerprint(weights_path)}")

        @jax.jit
        def fwd(params, top, x):
            if resize_to and (x.shape[1] != resize_to
                              or x.shape[2] != resize_to):
                x = jax.image.resize(
                    x, (x.shape[0], resize_to, resize_to, 3), "bilinear")
            feats = inception_v3_features(params, x)
            w, b = top
            logits = jnp.dot(feats, w,
                             precision=matmul_precision(feats.dtype)) + b
            return jax.nn.softmax(logits, axis=-1)

        self._fwd = functools.partial(fwd, self.params, top)

    def __call__(self, images) -> np.ndarray:
        x = jnp.asarray(images, jnp.float32)
        return np.asarray(jax.device_get(self._fwd(x)))
