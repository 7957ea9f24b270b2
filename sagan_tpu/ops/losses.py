"""GAN losses: hinge and binary cross-entropy.

Per-example semantics follow /root/reference/sagan/main.py:20-37,
reduced to *local means*; under data parallelism the train step
``lax.pmean``s the scalar loss/gradients, so the optimized objective is
the exact GLOBAL batch mean.

Deviations from the reference (deliberate, see PARITY.md):
  * Overall scale: the reference optimizes
    ``reduce_mean(local) * (1/global_batch_size)``
    (/root/reference/sagan/main.py:184,216) — an extra constant 1/B_g
    on top of the mean, making its gradients per-replica-batch-times
    smaller than the plain global mean's.  We optimize the plain global
    mean (the standard formulation; loss values and grad norms are then
    batch-size-independent).  With Adam(beta1=0) a constant gradient
    scale only enters through eps=1e-7, so training behavior matches;
    absolute grad-norm summaries are NOT comparable to the reference's.
  * The BCE variant treats D's output as a *logit* (the reference feeds
    raw scores into Keras ``binary_crossentropy`` with
    ``from_logits=False``, i.e. interprets unbounded scores as
    probabilities — numerically broken for real use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_mean(x):
    return jnp.mean(x.astype(jnp.float32))


def hinge_g(d_fake: jax.Array) -> jax.Array:
    """L_G = -E[D(G(z))]  (/root/reference/sagan/main.py:21-22)."""
    return -_flat_mean(d_fake)


def hinge_d(d_real: jax.Array, d_fake: jax.Array) -> jax.Array:
    """L_D = E[relu(1-D(x))] + E[relu(1+D(G(z)))]
    (/root/reference/sagan/main.py:24-27)."""
    return (_flat_mean(jax.nn.relu(1.0 - d_real.astype(jnp.float32)))
            + _flat_mean(jax.nn.relu(1.0 + d_fake.astype(jnp.float32))))


def _bce_logits(logits, target):
    logits = logits.astype(jnp.float32)
    # stable: max(x,0) - x*z + log(1+exp(-|x|))
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_g(d_fake: jax.Array) -> jax.Array:
    return _bce_logits(d_fake, 1.0)


def bce_d(d_real: jax.Array, d_fake: jax.Array) -> jax.Array:
    return _bce_logits(d_real, 1.0) + _bce_logits(d_fake, 0.0)


LOSSES = {
    "hinge_loss": (hinge_g, hinge_d),
    "cross_entropy": (bce_g, bce_d),
}


def get_loss(name: str):
    """Loss selection by config key (/root/reference/sagan/main.py:122-131)."""
    if name not in LOSSES:
        raise ValueError(f"Unsupported loss type: {name!r} "
                         f"(choose from {sorted(LOSSES)})")
    return LOSSES[name]
