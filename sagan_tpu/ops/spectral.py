"""Spectral normalization as a pure function (SNGAN, Miyato et al. 2018).

The reference carries two broken implementations (SURVEY.md Appendix A.1/A.8):
``/root/reference/layers.py:50-68`` computes sigma but the division
``W = W / sigma`` rebinds a Python local (never normalizes the kernel), and
the power-iteration update runs only at eval time;
``/root/reference/sagan/layers.py`` is weight normalization mislabeled as
spectral normalization.  This module implements the real thing:

* the kernel is reshaped to a matrix ``[fan_in, c_out]`` (output channels
  last, the JAX HWIO / [in, out] convention) — a true matricization, unlike
  the reference's scrambling ``tf.reshape(W, [c_out, -1])``;
* ``n_iter`` rounds of power iteration refine a persistent ``u`` estimate of
  the leading left-singular vector, carried in the module's ``aux`` state;
* sigma is computed with ``stop_gradient`` on u/v but differentiably in W,
  so gradients flow through the normalization (as in the paper and the
  torch/TF-Addons production implementations);
* everything is fp32 regardless of compute dtype — sigma estimation in
  bf16 destabilizes GAN training for no measurable speedup (the matvecs
  are tiny next to the convs they guard).

TPU note: the per-step cost is two skinny matvecs per wrapped layer —
negligible; XLA fuses the final ``w / sigma`` scale into the consumer
convolution's weight load, so no extra HBM round-trip occurs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def power_iterate(w_mat: jax.Array, u: jax.Array, n_iter: int = 1):
    """Run ``n_iter`` power-iteration steps.

    Args:
      w_mat: [fan_in, c_out] fp32 matrix.
      u: [c_out] current estimate of the leading right-singular... (of
         w_matᵀ) — the vector multiplied against columns.
    Returns:
      (sigma, u_new, v_new): leading singular value estimate and updated
      vectors; u_new/v_new carry no gradient.
    """
    if n_iter < 1:
        # fori_loop(0, 0) would leave v = zeros -> sigma = 0 -> the
        # caller divides by eps, a ~1e12x weight blow-up with no error
        # pointing at the config (resolve_config validates the config
        # path; this guards direct library users)
        raise ValueError(f"power_iterate needs n_iter >= 1, got {n_iter}")
    u = jax.lax.stop_gradient(u)
    w = jax.lax.stop_gradient(w_mat)
    hi = jax.lax.Precision.HIGHEST

    def mv(a, b):
        return jnp.matmul(a, b, precision=hi)

    def body(_, carry):
        u_c, _v = carry
        v_c = _l2_normalize(mv(w, u_c))          # [fan_in]
        u_c = _l2_normalize(mv(v_c, w))          # [c_out]
        return u_c, v_c

    v0 = jnp.zeros((w.shape[0],), w.dtype)
    u, v = jax.lax.fori_loop(0, n_iter, body, (u, v0))
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    # sigma differentiable through w_mat (NOT the stop-gradded copy)
    sigma = mv(mv(v, w_mat), u)
    return sigma, u, v


def spectral_normalize(w: jax.Array, u: jax.Array, n_iter: int = 1,
                       eps: float = 1e-12, backend: str = "xla",
                       interpret: bool = False):
    """Normalize a kernel by its leading singular value.

    Args:
      w: kernel of any rank; last axis = output channels.
      u: persistent power-iteration vector, shape [c_out].
      backend: 'xla' (default) or 'pallas' (the fused VMEM-resident
        kernel, ops/pallas_spectral.py).  A trace-time-static argument —
        layers carry it as config (nn.layers.set_sn_backend), so two
        models with different backends coexist in one process.
      interpret: run the pallas backend in interpreter mode (CPU tests).
    Returns:
      (w_bar, u_new): normalized kernel (same shape/dtype as w) and the
      updated u to store back into aux state.
    """
    if backend == "pallas":
        from .pallas_spectral import spectral_normalize_fused
        return spectral_normalize_fused(w, u, n_iter=n_iter, eps=eps,
                                        interpret=interpret)
    if backend != "xla":
        raise ValueError(f"unknown SN backend {backend!r}")
    return spectral_normalize_xla(w, u, n_iter=n_iter, eps=eps)


def spectral_normalize_xla(w: jax.Array, u: jax.Array, n_iter: int = 1,
                           eps: float = 1e-12):
    """The XLA-op implementation (also the fallback for weights too large
    for the fused kernel's VMEM residence)."""
    w32 = w.astype(jnp.float32)
    w_mat = w32.reshape(-1, w.shape[-1])
    sigma, u_new, _ = power_iterate(w_mat, u.astype(jnp.float32), n_iter)
    w_bar = w32 / (sigma + eps)
    return w_bar.astype(w.dtype), u_new


def exact_sigma(w: jax.Array) -> jax.Array:
    """Exact leading singular value via SVD (test oracle only)."""
    w_mat = w.astype(jnp.float32).reshape(-1, w.shape[-1])
    return jnp.linalg.svd(w_mat, compute_uv=False)[0]
