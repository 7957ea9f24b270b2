"""Weight initializers (TF-Keras-compatible defaults).

The reference relies on Keras layer defaults: ``glorot_uniform`` kernels,
zero biases, ``uniform(-0.05, 0.05)`` embeddings
(cf. ``/root/reference/sagan/models/generator.py`` which never overrides
initializers).  We reproduce those defaults so variable statistics match,
and add ``orthogonal`` (used by the official SAGAN release) as an option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def _fans(shape):
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    # conv kernels [kh, kw, cin, cout] (HWIO)
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return shape[-2] * receptive, shape[-1] * receptive


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal(stddev: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)
    return init


def uniform(scale: float = 0.05):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def orthogonal(scale: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            return normal(scale)(key, shape, dtype)
        n_rows = shape[-1]
        n_cols = 1
        for d in shape[:-1]:
            n_cols *= d
        mat_shape = (max(n_rows, n_cols), min(n_rows, n_cols))
        a = jax.random.normal(key, mat_shape, jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))
        if n_rows < n_cols:
            q = q.T
        return (scale * q.reshape(shape[:-1] + (n_rows,))).astype(dtype)
    return init


def l2_normal(key, shape, dtype=jnp.float32):
    """Random normal, L2-normalized — spectral-norm u/v vector init
    (reference semantics at /root/reference/layers.py:35-38)."""
    v = jax.random.normal(key, shape, dtype)
    return v / (jnp.linalg.norm(v) + 1e-12)
