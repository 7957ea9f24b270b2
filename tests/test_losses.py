import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.ops.losses import bce_d, bce_g, get_loss, hinge_d, hinge_g


def test_hinge_g_is_negative_mean():
    d_fake = jnp.array([[1.0], [3.0]])
    assert float(hinge_g(d_fake)) == -2.0


def test_hinge_d_values():
    d_real = jnp.array([[2.0], [0.0]])   # relu(1-x): 0, 1 -> mean 0.5
    d_fake = jnp.array([[-2.0], [0.5]])  # relu(1+x): 0, 1.5 -> mean 0.75
    np.testing.assert_allclose(float(hinge_d(d_real, d_fake)), 1.25)


def test_hinge_d_saturates_when_confident():
    d_real = jnp.full((8, 1), 10.0)
    d_fake = jnp.full((8, 1), -10.0)
    assert float(hinge_d(d_real, d_fake)) == 0.0


def test_bce_matches_manual_sigmoid_ce():
    logits = jnp.array([[0.3], [-1.2]])
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expected_g = -np.mean(np.log(p))
    np.testing.assert_allclose(float(bce_g(logits)), expected_g, rtol=1e-6)
    expected_d = -np.mean(np.log(p)) - np.mean(np.log(1 - p))
    np.testing.assert_allclose(float(bce_d(logits, logits)), expected_d,
                               rtol=1e-6)


def test_get_loss_selection():
    assert get_loss("hinge_loss") == (hinge_g, hinge_d)
    assert get_loss("cross_entropy") == (bce_g, bce_d)
    with pytest.raises(ValueError):
        get_loss("wasserstein")
