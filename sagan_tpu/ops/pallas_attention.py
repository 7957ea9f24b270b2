"""Fused SAGAN attention as Pallas TPU kernels.

Replaces the reference's unfused ``matmul → softmax → matmul`` sequence
(/root/reference/layers.py:108-116), which materializes the
``[B, N, M]`` probability matrix in HBM (N = H·W up to 4096 tokens — a
16 MB fp32 round-trip per batch element at 64×64).  Here the probability
tile lives only in VMEM:

* forward: grid over (batch, query-blocks); K/V for the whole (small,
  4×-downsampled) key set stay resident in VMEM; one fp32 QKᵀ on the MXU,
  numerically-stable softmax on the VPU, PV matmul — one HBM write of
  the output only;
* backward (custom VJP): recomputes the probability tile (flash-attention
  style — cheaper than storing it) and accumulates dK/dV across query
  blocks by revisiting the same output block on the innermost grid axis,
  zero-initialized at the first visit;
* logits are **unscaled** per SAGAN semantics (no 1/√d).

Shapes must tile: N divisible by the query block (powers of two — always
true for H·W feature maps), M and the channel dims are padded by Mosaic
as needed.  The query block size is chosen so the kernel's VMEM
footprint (dominated by the [block_n, M] fp32 probability tiles — four
of them live simultaneously in the backward) stays under ``VMEM_BUDGET``;
this covers every shape the model families can request, including
non-downsampled 128px maps (N = M = 16384).  ``attention_fused`` falls
back to the einsum reference for untileable shapes and for key sets so
large that even an 8-row query block would not fit (M ≳ 100k, i.e.
non-downsampled 256px maps — XLA's own tiling handles those correctly,
just without the fusion win).
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
    """Worst-case resident bytes of the backward kernel (the larger of
    the two passes): four fp32 [block_n, M] tiles (logits, p, dp, dlog)
    + K/V inputs and fp32 dK/dV accumulators + q/g/dq blocks."""
    tiles = 4 * block_n * m * 4
    kv = 2 * m * (d + c) * 4
    qg = 3 * block_n * (d + c) * 4
    return tiles + kv + qg


def _pick_block(n: int, m: int, d: int, c: int) -> int:
    """Largest query block that divides N and fits the VMEM budget."""
    for bn in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % bn == 0 and _bwd_vmem_bytes(bn, m, d, c) <= VMEM_BUDGET:
            return bn
    return 0


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                      # [BN, D]
    k = k_ref[0]                      # [M, D]
    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BN, M]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BN, C]
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd(q, k, v, block_n, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    grid = (b, n // block_n)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
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
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)              # [BN, C]

    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BN, M]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    p = e / jnp.sum(e, axis=-1, keepdims=True)    # [BN, M] fp32

    dp = lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BN, M]
    dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq = lax.dot_general(
        dlog, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BN, D]
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_part = lax.dot_general(
        dlog, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [M, D]
    dv_part = lax.dot_general(
        p, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [M, C]

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_part.astype(dk_ref.dtype)
    dv_ref[0] += dv_part.astype(dv_ref.dtype)


def _bwd_call(q, k, v, g, block_n, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    grid = (b, n // block_n)  # query-block axis innermost: dk/dv blocks
    # stay resident and accumulate across visits
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_fused(q, k, v, block_n, interpret):
    return _fwd(q, k, v, block_n, interpret)


def _attention_fwd(q, k, v, block_n, interpret):
    return _fwd(q, k, v, block_n, interpret), (q, k, v)


def _attention_bwd(block_n, interpret, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, block_n, interpret)


_attention_fused.defvjp(_attention_fwd, _attention_bwd)


def attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(q @ kᵀ) @ v, fused.  q:[B,N,D] k:[B,M,D] v:[B,M,C].

    Falls back to the einsum reference when N has no power-of-two block
    divisor or when no query block keeps the kernel inside VMEM_BUDGET
    (see module docstring)."""
    n, d = q.shape[1], q.shape[2]
    m, c = k.shape[1], v.shape[2]
    block_n = _pick_block(n, m, d, c)
    if block_n == 0:
        from .attention import attention_reference
        return attention_reference(q, k, v)
    return _attention_fused(q, k, v, block_n, interpret)
