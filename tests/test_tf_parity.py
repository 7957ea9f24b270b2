"""Golden-value parity vs TensorFlow/Keras layer semantics.

The reference composes Keras layers; these tests pin our layers to the
same numerics with shared weights — especially the classic divergence
traps: Conv2DTranspose 'SAME' output placement, BatchNorm
momentum/epsilon conventions, LeakyReLU slope."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from sagan_tpu.nn.layers import BatchNorm, Conv, ConvTranspose, leaky_relu

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def test_conv_same_stride2_matches_keras():
    x = RNG.normal(size=(2, 16, 16, 4)).astype(np.float32)
    w = RNG.normal(size=(4, 4, 4, 8)).astype(np.float32) * 0.1

    tf_out = tf.nn.conv2d(x, w, strides=2, padding="SAME").numpy()

    conv = Conv(4, 8, kernel=4, stride=2, use_bias=False)
    v = conv.init(KEY)
    v["params"]["w"] = jnp.asarray(w)
    ours, _ = conv(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), tf_out, atol=1e-4)


def test_conv_transpose_same_stride2_matches_keras():
    """Keras Conv2DTranspose(out, 4, 2, 'same') vs lax.conv_transpose —
    the generator upsampling block (sagan/models/generator.py:8)."""
    x = RNG.normal(size=(2, 8, 8, 4)).astype(np.float32)
    w = RNG.normal(size=(4, 4, 4, 6)).astype(np.float32) * 0.1

    layer = tf.keras.layers.Conv2DTranspose(6, 4, 2, padding="same",
                                            use_bias=False)
    layer.build((None, 8, 8, 4))
    # keras kernel layout [kh, kw, out, in]; ours is HWIO = [kh, kw, in, out]
    layer.kernel.assign(np.transpose(w, (0, 1, 3, 2)))
    tf_out = layer(x).numpy()

    convt = ConvTranspose(4, 6, kernel=4, stride=2, use_bias=False)
    v = convt.init(KEY)
    v["params"]["w"] = jnp.asarray(w)
    ours, _ = convt(v, jnp.asarray(x))
    assert ours.shape == tf_out.shape == (2, 16, 16, 6)
    np.testing.assert_allclose(np.asarray(ours), tf_out, atol=1e-4)


def test_conv_transpose_same_stride2_odd_kernel_matches_keras():
    """3x3 stride-2 transpose (resnet family, models/generator.py:10)."""
    x = RNG.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w = RNG.normal(size=(3, 3, 3, 5)).astype(np.float32) * 0.1

    layer = tf.keras.layers.Conv2DTranspose(5, 3, 2, padding="same",
                                            use_bias=False)
    layer.build((None, 8, 8, 3))
    layer.kernel.assign(np.transpose(w, (0, 1, 3, 2)))
    tf_out = layer(x).numpy()

    convt = ConvTranspose(3, 5, kernel=3, stride=2, use_bias=False)
    v = convt.init(KEY)
    v["params"]["w"] = jnp.asarray(w)
    ours, _ = convt(v, jnp.asarray(x))
    assert ours.shape == tf_out.shape
    np.testing.assert_allclose(np.asarray(ours), tf_out, atol=1e-4)


def test_batchnorm_train_and_stats_match_keras():
    x = (RNG.normal(size=(8, 4, 4, 3)) * 2 + 1).astype(np.float32)

    layer = tf.keras.layers.BatchNormalization(momentum=0.99, epsilon=1e-3)
    layer.build((None, 4, 4, 3))
    tf_out = layer(x, training=True).numpy()

    bn = BatchNorm(3, momentum=0.99, eps=1e-3)
    v = bn.init(KEY)
    ours, aux = bn(v, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), tf_out, atol=1e-3)
    np.testing.assert_allclose(np.asarray(aux["mean"]),
                               layer.moving_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["var"]),
                               layer.moving_variance.numpy(), rtol=1e-3)


def test_leaky_relu_slope_matches_keras():
    x = np.linspace(-2, 2, 11).astype(np.float32)
    tf_out = tf.keras.layers.LeakyReLU(negative_slope=0.1)(x).numpy()
    np.testing.assert_allclose(np.asarray(leaky_relu(jnp.asarray(x), 0.1)),
                               tf_out, atol=1e-7)


def test_hinge_losses_match_tf_formulation():
    from sagan_tpu.ops.losses import hinge_d, hinge_g

    d_real = RNG.normal(size=(8, 1)).astype(np.float32)
    d_fake = RNG.normal(size=(8, 1)).astype(np.float32)
    # /root/reference/sagan/main.py:21-27 reduced to means
    tf_g = float(tf.reduce_mean(-d_fake))
    tf_d = float(tf.reduce_mean(tf.nn.relu(1.0 - d_real))
                 + tf.reduce_mean(tf.nn.relu(1.0 + d_fake)))
    np.testing.assert_allclose(float(hinge_g(jnp.asarray(d_fake))), tf_g,
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(hinge_d(jnp.asarray(d_real), jnp.asarray(d_fake))), tf_d,
        rtol=1e-6)
