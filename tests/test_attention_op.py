"""Attention-op tests: einsum oracle behavior (softmax rows, downsampled
K/V shapes) — the Pallas kernel is tested against this oracle in
test_pallas_kernels.py."""

import jax
import jax.numpy as jnp
import numpy as np

from sagan_tpu.ops.attention import attention, attention_reference

KEY = jax.random.PRNGKey(0)


def test_reference_matches_manual_numpy():
    q = jax.random.normal(KEY, (2, 16, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 6))
    out = np.asarray(attention_reference(q, k, v))

    qn, kn, vn = map(np.asarray, (q, k, v))
    logits = np.einsum("bnd,bmd->bnm", qn, kn)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bnm,bmc->bnc", p, vn)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_uniform_keys_give_mean_of_values():
    q = jnp.zeros((1, 4, 3))
    k = jax.random.normal(KEY, (1, 5, 3))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 2))
    out = np.asarray(attention_reference(q, k, v))
    expected = np.broadcast_to(np.asarray(jnp.mean(v, 1))[:, None, :],
                               out.shape)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_dispatch_falls_back_to_einsum_on_cpu():
    q = jax.random.normal(KEY, (1, 1024, 8))
    k = jax.random.normal(KEY, (1, 256, 8))
    v = jax.random.normal(KEY, (1, 256, 16))
    out = attention(q, k, v)  # must not raise on CPU
    assert out.shape == (1, 1024, 16)


def test_grad_through_attention_finite():
    def loss(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    q = jax.random.normal(KEY, (1, 16, 4))
    k = jax.random.normal(KEY, (1, 4, 4))
    v = jax.random.normal(KEY, (1, 4, 4))
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
