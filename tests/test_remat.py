"""Rematerialization (`remat: True`) — gradient checkpointing per model
stage via nn.module.remat_span.

The reference has no analog (TF2 eager tapes keep every activation,
/root/reference/sagan/trainer.py); remat is a TPU HBM lever.  The
contract under test: remat changes NOTHING numerically — outputs, aux
updates (SN power-iteration vectors, BN running moments), and gradients
are identical to the unrematted graph — while the compiled backward
saves strictly less temp memory at training shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.models import get_discriminator, get_generator

KEY = jax.random.PRNGKey(7)


def make_config(**kw):
    cfg = {
        "model": "vanilla",
        "z_dim": 16,
        "gf_dim": 8,
        "df_dim": 8,
        "img_size": 32,
        "use_attention": True,
        "attn_dim_G": [16],
        "attn_dim_D": [8],
        "use_label": False,
        "num_classes": 5,
        "compute_dtype": "float32",
    }
    cfg.update(kw)
    return cfg


def _tree_allclose(a, b, rtol=1e-6, atol=1e-6):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
@pytest.mark.parametrize("use_label", [False, True])
def test_generator_grads_match_without_remat(model, use_label):
    cfg = make_config(model=model, use_label=use_label, use_cond_bn=use_label)
    z = jax.random.normal(KEY, (2, 16))
    labels = jnp.array([1, 3])

    results = {}
    for remat in (False, True):
        gen = get_generator({**cfg, "remat": remat})
        v = gen.init(KEY)

        def loss(params):
            img, new_aux = gen({"params": params, "aux": v["aux"]},
                               z, labels, train=True)
            return jnp.sum(img ** 2), new_aux

        (val, new_aux), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(v["params"])
        results[remat] = (val, new_aux, grads)

    _tree_allclose(results[False][0], results[True][0])
    _tree_allclose(results[False][1], results[True][1])  # aux: SN u/v, BN
    _tree_allclose(results[False][2], results[True][2])  # grads


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
def test_discriminator_grads_match_without_remat(model):
    cfg = make_config(model=model, use_label=True)
    img = jax.random.normal(KEY, (2, 32, 32, 3))
    labels = jnp.array([0, 4])

    results = {}
    for remat in (False, True):
        disc = get_discriminator({**cfg, "remat": remat})
        v = disc.init(KEY)

        def loss(params):
            out, new_aux = disc({"params": params, "aux": v["aux"]},
                                img, labels, train=True)
            return jnp.sum(out ** 2), new_aux

        (val, new_aux), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(v["params"])
        results[remat] = (val, new_aux, grads)

    _tree_allclose(results[False][0], results[True][0])
    _tree_allclose(results[False][1], results[True][1])
    _tree_allclose(results[False][2], results[True][2])


def test_remat_composes_with_cross_replica_bn():
    """remat span containing a lax.pmean (cross-replica BN moments) must
    trace and match the unrematted result under shard_map."""
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    cfg = make_config()
    z = jax.random.normal(KEY, (2 * n, 16))

    outs = {}
    for remat in (False, True):
        gen = get_generator({**cfg, "remat": remat})
        v = gen.init(KEY)

        def fwd(v, z):
            img, new_aux = gen(v, z, train=True, axis="data")
            return img, new_aux

        sharded = shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=(P("data"), P()))
        outs[remat] = jax.jit(sharded)(v, z)

    _tree_allclose(outs[False][0], outs[True][0])
    _tree_allclose(outs[False][1], outs[True][1])


def test_remat_reduces_saved_residuals():
    """remat must shrink what the AD system saves between forward and
    backward (that is the entire point).  saved_residuals is the
    backend-independent probe: it lists exactly the arrays the forward
    pass stores for the backward; per-stage spans must cap that at the
    stage boundaries instead of every interior activation."""
    try:
        from jax.ad_checkpoint import saved_residuals
    except ImportError:
        try:  # jax 0.9: only print_saved_residuals is re-exported
            from jax._src.ad_checkpoint import saved_residuals
        except ImportError:
            pytest.skip("saved_residuals not available in this jax")

    cfg = make_config(img_size=64, gf_dim=16, attn_dim_G=[32])
    z = jax.random.normal(KEY, (8, 16))

    sizes = {}
    for remat in (False, True):
        gen = get_generator({**cfg, "remat": remat})
        v = gen.init(KEY)

        def loss(params):
            img, _ = gen({"params": params, "aux": v["aux"]}, z, train=True)
            return jnp.sum(img ** 2)

        res = saved_residuals(loss, v["params"])
        sizes[remat] = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a, _ in res if hasattr(a, "shape"))
    # at 64px the unrematted graph saves every interior activation of
    # every stage; the spans should cut saved bytes by a large factor
    assert sizes[True] < 0.7 * sizes[False], sizes


def test_remat_span_rng_and_aux_threading():
    """Direct make_rng calls at stage level and aux read-through across
    spans must behave IDENTICALLY remat on/off (the documented contract):
    the span Ctx continues the parent's rng-call counter (distinct,
    sequence-identical keys per span) and sees aux values written by an
    earlier span in the same forward."""
    from sagan_tpu.nn.module import Module, remat_span

    class Probe(Module):
        def __init__(self):
            super().__init__()
            self.aux_spec("carry", (4,), lambda k, s, d: jnp.zeros(s, d))
            self.param_spec("w", (4,), lambda k, s, d: jnp.ones(s, d))

        def forward(self, cx, x, remat):
            def stage1(sub, x):
                noise = jax.random.normal(sub.make_rng(), x.shape)
                sub.put_aux("carry", x.sum(0))
                return x + 0.1 * noise
            def stage2(sub, x):
                noise = jax.random.normal(sub.make_rng(), x.shape)
                carry = sub.get_aux("carry")  # stage1's write, not init
                return x * sub.param("w") + 0.1 * noise + carry
            if remat:
                x = remat_span(cx, stage1, x)
                x = remat_span(cx, stage2, x)
            else:
                x = stage1(cx, x)
                x = stage2(cx, x)
            return x

    probe = Probe()
    v = probe.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4))
    rng = jax.random.PRNGKey(11)

    outs, auxs, grads = {}, {}, {}
    for remat in (False, True):
        def loss(params):
            out, new_aux = probe({"params": params, "aux": v["aux"]},
                                 x, remat, train=True, rng=rng)
            return jnp.sum(out ** 2), (out, new_aux)
        (l, (out, new_aux)), g = jax.value_and_grad(
            loss, has_aux=True)(v["params"])
        outs[remat], auxs[remat], grads[remat] = out, new_aux, g

    _tree_allclose(outs[False], outs[True])
    _tree_allclose(auxs[False], auxs[True])
    _tree_allclose(grads[False], grads[True])
    # the two stages must have drawn DIFFERENT keys (counter advanced
    # across spans); with a stuck counter stage2's noise would equal
    # stage1's, and out would differ from the unrematted graph anyway —
    # but assert the carry read-through explicitly too:
    np.testing.assert_allclose(np.asarray(auxs[True]["carry"]),
                               np.asarray(x.sum(0)), rtol=1e-6)
