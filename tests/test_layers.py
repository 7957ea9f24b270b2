"""Layer-level tests: shapes, SN aux threading, cross-replica BatchNorm."""

import jax
import jax.numpy as jnp
import numpy as np

from sagan_tpu.nn.attention import SelfAttention
from sagan_tpu.nn.layers import (BatchNorm, ConditionalBatchNorm, Conv,
                                 ConvTranspose, Dense, Embedding, max_pool)
from sagan_tpu.ops.spectral import exact_sigma

KEY = jax.random.PRNGKey(0)


def test_dense_shapes():
    layer = Dense(16, 32)
    v = layer.init(KEY)
    x = jax.random.normal(KEY, (4, 16))
    y, aux = layer(v, x)
    assert y.shape == (4, 32)
    assert aux == v["aux"] == {}


def test_dense_sn_updates_u_only_in_train():
    layer = Dense(16, 32, sn=True)
    v = layer.init(KEY)
    x = jax.random.normal(KEY, (4, 16))
    _, aux_eval = layer(v, x, train=False)
    assert np.allclose(aux_eval["u"], v["aux"]["u"])
    _, aux_train = layer(v, x, train=True)
    assert not np.allclose(aux_train["u"], v["aux"]["u"])
    assert np.isclose(float(jnp.linalg.norm(aux_train["u"])), 1.0, atol=1e-5)


def test_sn_layer_effectively_normalizes_after_warmup():
    layer = Dense(64, 48, sn=True)
    v = layer.init(KEY)
    x = jnp.zeros((2, 64))
    aux = v["aux"]
    for _ in range(30):
        _, aux = layer({"params": v["params"], "aux": aux}, x, train=True)
    # one more apply: the effective kernel y = x @ (w/sigma) has sigma≈1
    w = v["params"]["w"]
    from sagan_tpu.ops.spectral import spectral_normalize
    w_bar, _ = spectral_normalize(w, aux["u"])
    np.testing.assert_allclose(float(exact_sigma(w_bar)), 1.0, rtol=1e-3)


def test_conv_and_transpose_shapes():
    conv = Conv(8, 16, kernel=4, stride=2)
    v = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 32, 32, 8))
    y, _ = conv(v, x)
    assert y.shape == (2, 16, 16, 16)

    convt = ConvTranspose(8, 16, kernel=4, stride=2)
    v = convt.init(KEY)
    y, _ = convt(v, x)
    assert y.shape == (2, 64, 64, 16)


def test_max_pool_downsamples_by_2():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = max_pool(x)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0],
                               [[5.0, 7.0], [13.0, 15.0]])


def test_embedding_lookup():
    emb = Embedding(10, 8)
    v = emb.init(KEY)
    y, _ = emb(v, jnp.array([0, 3, 9]))
    assert y.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(v["params"]["w"][3]))


def test_batchnorm_train_normalizes_and_updates_stats():
    bn = BatchNorm(4, momentum=0.9)
    v = bn.init(KEY)
    x = 3.0 + 2.0 * jax.random.normal(KEY, (16, 8, 8, 4))
    y, aux = bn(v, x, train=True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))), 0.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))), 1.0,
                               atol=1e-2)
    assert not np.allclose(aux["mean"], 0.0)


def test_batchnorm_eval_uses_running_stats():
    bn = BatchNorm(4)
    v = bn.init(KEY)
    v["aux"]["mean"] = jnp.full((4,), 5.0)
    v["aux"]["var"] = jnp.full((4,), 4.0)
    x = jnp.full((2, 2, 2, 4), 5.0)
    y, aux = bn(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)
    assert np.allclose(aux["mean"], 5.0)  # unchanged in eval


def test_batchnorm_cross_replica_matches_global_batch():
    """shard_map'd BN with pmean over 'data' == single-device BN on the
    full batch (the property the reference's per-replica BN violates)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    bn = BatchNorm(4)
    v = bn.init(KEY)
    x = jax.random.normal(KEY, (16, 4, 4, 4)) * 3.0 + 1.0

    y_ref, aux_ref = bn(v, x, train=True)

    def step(v, x):
        y, aux = bn(v, x, train=True, axis="data")
        return y, aux

    y_sh, aux_sh = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
    ))(v, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_sh["mean"]),
                               np.asarray(aux_ref["mean"]), atol=1e-5)


def test_conditional_batchnorm_selects_per_class_affine():
    cbn = ConditionalBatchNorm(4, num_classes=3)
    v = cbn.init(KEY)
    v["params"]["gamma"] = jnp.array([[1.0] * 4, [2.0] * 4, [3.0] * 4])
    x = jax.random.normal(KEY, (6, 2, 2, 4))
    labels = jnp.array([0, 1, 2, 0, 1, 2])
    y, _ = cbn(v, x, labels, train=True)
    # per-class gamma scales the normalized activations
    y0 = np.asarray(y[labels == 1])
    y1 = np.asarray(y[labels == 2])
    assert np.std(y1) / np.std(y0) > 1.2


def test_self_attention_shapes_and_gate_zero_init():
    attn = SelfAttention(16)
    v = attn.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    y, _ = attn(v, x)
    assert y.shape == x.shape
    # sigma starts at 0 => identity at init (/root/reference/layers.py:76-79)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_self_attention_nonidentity_with_sigma():
    attn = SelfAttention(16, downsample=True)
    v = attn.init(KEY)
    v["params"]["sigma"] = jnp.array(1.0)
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    y, _ = attn(v, x)
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_make_rng_distinct_per_call():
    """Two make_rng() calls in one forward must yield different keys
    (identical keys silently correlate dropout/noise sites)."""
    import jax

    from sagan_tpu.nn.module import Ctx, Module

    class TwoRng(Module):
        def forward(self, cx: Ctx):
            return cx.make_rng(), cx.make_rng()

    m = TwoRng()
    variables = m.init(jax.random.PRNGKey(0))
    (k1, k2), _aux = m(variables, rng=jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_module_child_leaf_name_collision_raises():
    """A child module silently overwriting a same-named param leaf used
    to surface as a far-away type error; init must refuse."""
    import jax
    import pytest

    from sagan_tpu.nn.layers import Dense
    from sagan_tpu.nn.module import Module

    class Clash(Module):
        def __init__(self):
            super().__init__()
            self.param_spec("head", (4,), init=lambda k, s, d: jnp.zeros(s))
            self.head = Dense(4, 2)

        def forward(self, cx):  # pragma: no cover
            return None

    with pytest.raises(ValueError, match="collides"):
        Clash().init(jax.random.PRNGKey(0))


def test_self_attention_qk_v_dim_override():
    """TPU-first extension: attn qk/v widths are overridable (the MXU
    contracts over 128 lanes whether d=2 or d=128, so widening is
    near-free in step time — nn/attention.py docstring).  Default stays
    exact reference parity (theta/phi c/8, g c/2, layers.py:89-99)."""
    ref = SelfAttention(16)
    assert ref.qk_dim == 2 and ref.v_dim == 8  # c/8, c/2 parity
    wide = SelfAttention(16, qk_dim=128, v_dim=16)
    v = wide.init(KEY)
    assert v["params"]["theta"]["w"].shape[-2:] == (16, 128)
    assert v["params"]["phi"]["w"].shape[-2:] == (16, 128)
    assert v["params"]["g"]["w"].shape[-2:] == (16, 16)
    assert v["params"]["out_proj"]["w"].shape[-2:] == (16, 16)
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    y, _ = wide(v, x)
    assert y.shape == x.shape
    # sigma gate still zero-initialized => identity at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    v["params"]["sigma"] = jnp.array(1.0)
    y, _ = wide(v, x)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))


def test_self_attention_rejects_zero_widths():
    """An explicit 0 must fail fast, not silently fall back to the
    reference widths (the `or`-default bug class)."""
    import pytest

    with pytest.raises(ValueError, match="must be >=1"):
        SelfAttention(16, qk_dim=0)
    with pytest.raises(ValueError, match="must be >=1"):
        SelfAttention(16, v_dim=0)
