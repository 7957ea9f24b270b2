"""Fused SAGAN attention as Pallas TPU kernels.

Replaces the reference's unfused ``matmul → softmax → matmul`` sequence
(/root/reference/layers.py:108-116), which materializes the
``[B, N, M]`` probability matrix in HBM (N = H·W up to 4096 tokens — a
16 MB fp32 round-trip per batch element at 64×64).  Here the probability
tile lives only in VMEM.

Design (v2, tuned on a real v5e — the op is VPU-bound at SAGAN's tiny
head dims, so the wins are tile-shape and elementwise-op economy, not
MXU scheduling):

* the grid batches ``G`` batch elements per step ([G, BN, ·] blocks),
  amortizing per-grid-step overhead — at [64, 4096, 1024] shapes the
  1-element grid ran 256 steps, a measurable fixed cost;
* softmax normalization is folded out of the [BN, M] tile: the kernel
  computes unnormalized ``E = exp(L − max)``, row-sums ``l``, and
  divides the [BN, C] *output* (M/C ≈ 128× less divide work); the
  backward applies the same trick (``dV = Eᵀ(g/l)``,
  ``dL = E⊙(dP − δ)/l`` with per-row scales on the skinny side);
* MXU contractions take bf16 operands with fp32 accumulation
  (``preferred_element_type``); all [BN, M] elementwise math is fp32;
* backward (custom VJP): recomputes E flash-style — cheaper than
  storing it — and accumulates dK/dV across query blocks by revisiting
  the same output block on the innermost grid axis;
* logits are **unscaled** per SAGAN semantics (no 1/√d).

Shapes must tile: N divisible by the query block (powers of two — always
true for H·W feature maps), M and the channel dims are padded by Mosaic
as needed.  The query block size is chosen so the kernel's VMEM
footprint (dominated by the [G·BN, M] fp32 tiles — three of them live
simultaneously in the backward) stays under ``VMEM_BUDGET``; this covers
every shape the model families can request, including non-downsampled
128px maps (N = M = 16384).  ``attention_fused`` falls back to the
einsum reference for untileable shapes and for key sets so large that
even an 8-row query block would not fit (M ≳ 100k, i.e. non-downsampled
256px maps — XLA's own tiling handles those correctly, just without the
fusion win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # of ~16 MB/core, leaving Mosaic headroom


def _bwd_vmem_bytes(block_n: int, m: int, d: int, c: int) -> int:
    """Worst-case resident bytes of the backward kernel per batch
    element: three fp32 [block_n, M] tiles (E, dP, and one temporary)
    + K/V inputs and fp32 dK/dV accumulators + q/g/dq blocks."""
    tiles = 3 * block_n * m * 4
    kv = 2 * m * (d + c) * 4
    qg = 3 * block_n * (d + c) * 4
    return tiles + kv + qg


def _pick_block(n: int, m: int, d: int, c: int) -> int:
    """Largest query block that divides N and fits the VMEM budget."""
    for bn in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % bn == 0 and _bwd_vmem_bytes(bn, m, d, c) <= VMEM_BUDGET:
            return bn
    return 0


def _pick_batch_block(b: int, block_n: int, m: int, d: int, c: int) -> int:
    """Batch elements per grid step: largest divisor of B whose total
    footprint stays in budget (≥1 by construction of _pick_block)."""
    for g in (16, 8, 4, 2):
        if b % g == 0 and g * _bwd_vmem_bytes(block_n, m, d, c) <= VMEM_BUDGET:
            return g
    return 1


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _prec(dtype):
    """fp32 operands must ask for HIGHEST or the TPU backend silently
    demotes the multiplies to bf16 (measured ~1e-2 relative error vs the
    fp32 oracle); bf16 operands use the native MXU path (HIGHEST+bf16
    crashes the Mosaic pipeline on this backend)."""
    return (lax.Precision.HIGHEST if dtype == jnp.float32 else
            lax.Precision.DEFAULT)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]                                 # [G, BN, D]
    k = k_ref[...]                                 # [G, M, D]
    v = v_ref[...]                                 # [G, M, C]
    prec = _prec(q.dtype)
    logits = lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, BN, M] fp32
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)                       # unnormalized probs
    l = jnp.sum(e, axis=-1, keepdims=True)         # [G, BN, 1]
    o = lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, BN, C]
    o_ref[...] = (o / l).astype(o_ref.dtype)       # normalize the skinny side


def _fwd(q, k, v, block_n, block_b, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    grid = (b // block_b, n // block_n)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_n, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (d + c),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + b * n * c * q.dtype.itemsize,
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(q, k, v)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    j = pl.program_id(1)
    q = q_ref[...]                                 # [G, BN, D]
    k = k_ref[...]                                 # [G, M, D]
    v = v_ref[...]                                 # [G, M, C]
    g = g_ref[...]                                 # [G, BN, C]

    prec = _prec(q.dtype)
    logits = lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, BN, M]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)                       # unnormalized probs
    linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [G, BN, 1]

    dp = lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, BN, M] fp32
    # δ_i = Σ_j p_ij dp_ij = (Σ_j e_ij dp_ij) · l_i⁻¹
    delta = jnp.sum(e * dp, axis=-1, keepdims=True) * linv
    # dL = P ⊙ (dP − δ) = E ⊙ (dP − δ) · l⁻¹ — row scale on the way out
    dlog = e * (dp - delta) * linv                 # [G, BN, M] fp32

    dlog16 = dlog.astype(k.dtype)
    dq = lax.dot_general(
        dlog16, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, BN, D]
    dq_ref[...] = dq.astype(dq_ref.dtype)

    dk_part = lax.dot_general(
        dlog16, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, M, D]
    # dV = Pᵀ g = Eᵀ (g · l⁻¹)
    dv_part = lax.dot_general(
        e.astype(v.dtype), (g.astype(jnp.float32) * linv).astype(v.dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                            # [G, M, C]

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    dk_ref[...] += dk_part.astype(dk_ref.dtype)
    dv_ref[...] += dv_part.astype(dv_ref.dtype)


def _bwd_call(q, k, v, g, block_n, block_b, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    grid = (b // block_b, n // block_n)  # query-block axis innermost:
    # dk/dv blocks stay resident and accumulate across visits
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_fused(q, k, v, block_n, block_b, interpret):
    return _fwd(q, k, v, block_n, block_b, interpret)


def _attention_fwd(q, k, v, block_n, block_b, interpret):
    return _fwd(q, k, v, block_n, block_b, interpret), (q, k, v)


def _attention_bwd(block_n, block_b, interpret, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, block_n, block_b, interpret)


_attention_fused.defvjp(_attention_fwd, _attention_bwd)


def attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(q @ kᵀ) @ v, fused.  q:[B,N,D] k:[B,M,D] v:[B,M,C].

    Falls back to the einsum reference when N has no power-of-two block
    divisor or when no query block keeps the kernel inside VMEM_BUDGET
    (see module docstring)."""
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    block_n = _pick_block(n, m, d, c)
    if block_n == 0:
        from .attention import attention_reference
        return attention_reference(q, k, v)
    block_b = _pick_batch_block(b, block_n, m, d, c)
    return _attention_fused(q, k, v, block_n, block_b, interpret)
