"""Exact BatchNorm statistics under gradient accumulation.

Round-4 fix (VERDICT r3 item 5): with ``grad_accum_steps=A``, per-micro
(mean, E[x²]) moments are accumulated, averaged, and momentum-applied
ONCE per optimizer step, so BN *running statistics* are exactly the
unaccumulated step's (mean and E[x²] are linear in the data).  The
latent stream is likewise drawn from the same key as the unaccumulated
step, so an A=4 step and an A=1 step see identical z's.

Reference semantics being matched: ``tf.keras.layers.BatchNormalization``
updates its moving stats once per ``apply_gradients``-scale step
(/root/reference/sagan/models/generator.py:10) — the reference has no
accumulation, so "once per optimizer step" is the faithful extension.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sagan_tpu.models import get_generator
from sagan_tpu.nn.layers import (BatchNorm, ConditionalBatchNorm,
                                 bn_accum_begin, bn_accum_finalize,
                                 bn_moment_paths)

from test_grad_accum import BASE, _batch, _build


def _run_accumulated(bn, variables, x, n_micro):
    """Drive the layer the way the trainer's micro-batch scan does."""
    paths = bn_moment_paths(bn)
    aux, saved = bn_accum_begin(paths, variables["aux"])
    chunks = np.split(np.asarray(x), n_micro)
    for chunk in chunks:
        _, aux = bn({"params": variables["params"], "aux": aux},
                    jnp.asarray(chunk), train=True, bn_accum=True)
    return bn_accum_finalize(paths, aux, saved, n_micro)


def test_bn_layer_accum_stats_exact():
    bn = BatchNorm(8)
    variables = bn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 8)) * 2.0 + 1.0

    _, aux_full = bn(variables, x, train=True)
    aux_acc = _run_accumulated(bn, variables, x, n_micro=4)

    np.testing.assert_allclose(aux_acc["mean"], aux_full["mean"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(aux_acc["var"], aux_full["var"],
                               rtol=0, atol=1e-6)


def test_cond_bn_layer_accum_stats_exact():
    bn = ConditionalBatchNorm(8, num_classes=4)
    variables = bn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 8)) - 0.5
    labels = jnp.arange(16) % 4

    _, aux_full = bn(variables, x, labels, train=True)

    paths = bn_moment_paths(bn)
    aux, saved = bn_accum_begin(paths, variables["aux"])
    for i in range(4):
        sl = slice(i * 4, (i + 1) * 4)
        _, aux = bn({"params": variables["params"], "aux": aux},
                    x[sl], labels[sl], train=True, bn_accum=True)
    aux_acc = bn_accum_finalize(paths, aux, saved, 4)

    np.testing.assert_allclose(aux_acc["mean"], aux_full["mean"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(aux_acc["var"], aux_full["var"],
                               rtol=0, atol=1e-6)


def test_step_accum_bn_stats_match_unaccumulated():
    """Full train step, A=4 vs A=1, same state and batch.

    The FIRST generator BN's input depends only on (z, params) — and the
    accumulation path draws the identical latent stream — so its running
    stats must match to fp32 tolerance.  Downstream BN layers see inputs
    normalized by per-micro moments (the documented remaining
    deviation), so they match only loosely."""
    aux_by_accum = {}
    for accum in (1, 4):
        mesh, state, step = _build(dict(BASE, grad_accum_steps=accum))
        im, lb = _batch(mesh)
        state, m = step(state, im, lb)
        assert np.isfinite(float(m["G_loss"]))
        aux_by_accum[accum] = jax.device_get(state.vars_g["aux"])

    paths = bn_moment_paths(get_generator(dict(BASE)))
    assert paths, "vanilla G must contain BatchNorm layers"

    def leaf(aux, path, name):
        for p in path:
            aux = aux[p]
        return aux[name]

    first = paths[0][0]
    for name in ("mean", "var"):
        np.testing.assert_allclose(
            leaf(aux_by_accum[4], first, name),
            leaf(aux_by_accum[1], first, name), rtol=1e-4, atol=1e-5,
            err_msg=f"first BN {name} must be exact under accumulation")
    # downstream BNs: same ballpark (per-micro normalization perturbs
    # their inputs by O(1/sqrt(micro_batch)))
    for path, _ in paths[1:]:
        a4 = leaf(aux_by_accum[4], path, "mean")
        a1 = leaf(aux_by_accum[1], path, "mean")
        assert float(np.max(np.abs(a4 - a1))) < 0.1, path


def test_legacy_inexact_mode_still_available():
    """exact_accum_bn=False restores the pre-round-4 per-micro momentum
    updates (kept for artifact reproducibility)."""
    mesh, state, step = _build(dict(BASE, grad_accum_steps=4,
                                    exact_accum_bn=False))
    im, lb = _batch(mesh)
    state, m = step(state, im, lb)
    assert np.isfinite(float(m["G_loss"]))
    assert np.isfinite(float(m["D_loss"]))
