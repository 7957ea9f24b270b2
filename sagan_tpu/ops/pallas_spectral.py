"""Fused power-iteration + kernel-scale as a single Pallas TPU kernel.

The north-star design point (BASELINE.json): spectral normalization
folded into the conv weight path.  The XLA path (ops/spectral.py) already
fuses well — power iteration is two skinny matvecs — but emits several
small HLO ops per wrapped layer; this kernel performs the whole
transform (n power-iteration steps, sigma, W/sigma) in one VMEM-resident
pass per weight: one HBM read of W, one write of W̄.

Scope: weights whose matricized form fits VMEM (~16 MB — every kernel in
both SAGAN families, by orders of magnitude).  Larger weights fall back
to the XLA path automatically.

Backward: W̄ = W/sigma with sigma = vᵀWu (u, v stop-gradient) gives the
closed-form rank-1 VJP  dW = g/sigma − (⟨g, W⟩/sigma²)·v uᵀ — cheap
elementwise + outer-product work left to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT_BYTES = 8 * 1024 * 1024  # W + W̄ copies must fit comfortably


def _sn_kernel(w_ref, u_ref, wbar_ref, unew_ref, v_ref, sigma_ref,
               *, n_iter, eps):
    w = w_ref[:]                                  # [F, O] fp32
    u0 = u_ref[:]                                 # [1, O]

    # True-fp32 matvecs as VPU multiply+reduce: a plain dot_general gets
    # silently demoted to bf16 multiplies by the TPU backend (measured
    # ~1e-3 relative error on sigma), and requesting Precision.HIGHEST
    # makes Mosaic stage an 18 MB fp32-emulation scratch that OOMs VMEM
    # on 0.5M-element weights.  Power iteration is bandwidth-bound —
    # elementwise multiply + axis reduce is the right unit and is exact
    # fp32.  Iteration structure matches ops.spectral.power_iterate:
    # v_i = l2n(W u_{i-1});  u_i = l2n(v_i W);  sigma = (v_n W) · u_n
    def body(_, carry):
        u, _v = carry
        v = jnp.sum(w * u, axis=1, keepdims=True)                 # [F, 1]
        v = v / (jnp.sqrt(jnp.sum(v * v)) + eps)
        u2 = jnp.sum(w * v, axis=0, keepdims=True)                # [1, O]
        return u2 / (jnp.sqrt(jnp.sum(u2 * u2)) + eps), v

    u, v = jax.lax.fori_loop(0, n_iter, body,
                             (u0, jnp.zeros_like(w[:, :1])))
    sigma = jnp.sum(jnp.sum(w * v, axis=0, keepdims=True) * u)
    wbar_ref[:] = w / (sigma + eps)
    unew_ref[:] = u
    v_ref[:] = v
    sigma_ref[0, 0] = sigma


def _sn_call(w_mat, u, n_iter, eps, interpret=False):
    f, o = w_mat.shape
    kernel = functools.partial(_sn_kernel, n_iter=n_iter, eps=eps)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
            jax.ShapeDtypeStruct((f, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(w_mat, u)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _sn_fused(w_mat, u, n_iter, eps, interpret):
    wbar, unew, _v, _sigma = _sn_call(w_mat, u, n_iter, eps, interpret)
    return wbar, unew


def _sn_fwd(w_mat, u, n_iter, eps, interpret):
    wbar, unew, v, sigma = _sn_call(w_mat, u, n_iter, eps, interpret)
    return (wbar, unew), (w_mat, unew[0], v[:, 0], sigma[0, 0])


def _sn_bwd(n_iter, eps, interpret, res, g):
    w_mat, u, v, sigma = res
    g_w, _g_u = g  # no gradient flows into the u estimate
    s = sigma + eps
    inner = jnp.sum(g_w * w_mat)
    dw = g_w / s - (inner / (s * s)) * jnp.outer(v, u)
    du = jnp.zeros((1, u.shape[0]), g_w.dtype)
    return dw, du


_sn_fused.defvjp(_sn_fwd, _sn_bwd)


def spectral_normalize_fused(w: jax.Array, u: jax.Array, n_iter: int = 1,
                             eps: float = 1e-12,
                             interpret: bool = False):
    """Drop-in replacement for ops.spectral.spectral_normalize backed by
    the fused Pallas kernel.  Falls back to the XLA path for weights too
    large for VMEM residence."""
    if n_iter < 1:
        # same guard as ops.spectral.power_iterate: zero iterations
        # would yield sigma=0 and a w/eps blow-up
        raise ValueError(f"spectral_normalize_fused needs n_iter >= 1, "
                         f"got {n_iter}")
    if w.size * 8 > VMEM_LIMIT_BYTES:
        from .spectral import spectral_normalize_xla
        return spectral_normalize_xla(w, u, n_iter=n_iter, eps=eps)
    w32 = w.astype(jnp.float32)
    w_mat = w32.reshape(-1, w.shape[-1])
    wbar, unew = _sn_fused(w_mat, u.astype(jnp.float32)[None, :],
                           n_iter, eps, interpret)
    return wbar.reshape(w.shape).astype(w.dtype), unew[0]
