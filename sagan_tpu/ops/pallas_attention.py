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
simultaneously in the backward, **counted at lane-padded widths**: a
[M, 2] ref occupies [M, 128] of VMEM) stays under ``VMEM_BUDGET``;
this covers every shape the model families request up to M = 4096 key
tokens at SAGAN's narrow head dims.

Past that (M = 16384 at d = 2 — e.g. the 256px G map with 4×
downsampled K/V, or any non-downsampled ≥128px map), whole-K/V
residency alone exceeds VMEM and the dispatch drops to the **flash
path**: key-axis blocking with an online running-max/denominator
softmax.  The forward emits per-row logsumexp; the backward uses the
flash identity δᵢ = Σⱼ pᵢⱼ dpᵢⱼ = dOᵢ·Oᵢ so no kernel ever holds a
full probability row.  Two backward strategies:

* **fused one-pass** (default where it fits): one kernel on the dK/dV
  grid (key blocks outer, query blocks inner) recomputes each [BN, BM]
  score tile once and produces *all three* gradients from it — dK/dV
  accumulate in place across the query axis, and the tile's dQ
  contribution is written to a per-key-block slab that a single XLA
  reduction sums afterwards.  The slab is emitted TRANSPOSED,
  [B, nk, D, N]: a Pallas output's HBM layout is forced major-to-minor,
  and with D minor the (8, 128) tiling lane-pads D → 64× the bytes at
  d = 2 (the natural [B, nk, N, D] slab hit a 16 GB compile-time HBM
  OOM at the 512px shape and silently carried ~4 GB + 64× the write
  traffic at 256px); with N minor the slab only sublane-pads D (2 → 8),
  ≈ nk·8·N fp32 of extra HBM traffic against a saved full second
  score-recompute pass.  Measured on the v5e at the 256px G map
  (B=16, N=65536, M=16384, d=2 — tools/bench_attn_bwd256.py +
  tools/bench_dq_slab_layout.py, round 4): 114.8 ms vs 212.3 ms for
  the two-kernel backward (BN=512/BM=2048 vs the two-kernel path's
  backward-safe BN=256/BM=1024), a 46% cut (36% from the fusion,
  a further 15% from the transposed slab).
* **two kernels** (fallback for shapes the fused picker rejects): dQ
  with the key axis innermost, then dK/dV with the query axis
  innermost — each recomputing the score tile independently.

``attention_fused`` falls back to the einsum reference only for
untileable shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # of ~16 MB/core, leaving Mosaic headroom


def _cost(flops: int, transcendentals: int, *arrays) -> pl.CostEstimate:
    """CostEstimate for a pallas_call: analytic FLOPs/exp count plus the
    logical bytes of every operand/result.  EVERY kernel in this file
    declares one — a Pallas kernel is an opaque custom call to XLA, so
    without the declaration ``compile().cost_analysis()`` counts ZERO
    FLOPs for it and every MFU/TFLOP number computed from the XLA count
    undercounts by the attention share (at the 256px/512px flash shapes
    that share is ~95% of the step: the committed round-4
    church256_flash "0.3% MFU" row was such an artifact — VERDICT r4
    item 1).  bench.py cross-checks the XLA count against the same
    formulas (``analytic_attention_flops``)."""
    bytes_accessed = sum(a.size * a.dtype.itemsize for a in arrays)
    return pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=transcendentals)


def _lanes(dim: int) -> int:
    """VMEM-resident width of a minor-most dim: Mosaic pads the lane
    axis to multiples of 128, so a [M, 2] ref costs [M, 128] of VMEM.
    Ignoring this under-counted K/V/dK/dV by 64x at SAGAN's d=2 and
    OOMed scoped VMEM at M=16384 (the 256px G map, 40 MB actual vs
    5 MB estimated)."""
    return -(-dim // 128) * 128


def _sublanes(dim: int) -> int:
    """Padded width of a second-minor dim (fp32 sublane tile = 8)."""
    return -(-dim // 8) * 8


def _bwd_vmem_bytes(block_n: int, m: int, d: int, c: int) -> int:
    """Worst-case resident bytes of the backward kernel per batch
    element: three fp32 [block_n, M] tiles (E, dP, and one temporary)
    + K/V inputs and fp32 dK/dV accumulators + q/g/dq blocks, all at
    lane-padded widths."""
    dc = _lanes(d) + _lanes(c)
    tiles = 3 * block_n * _lanes(m) * 4
    kv = 2 * m * dc * 4
    qg = 3 * block_n * dc * 4
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
        # QKᵀ (2bnmd) + EV (2bnmc); one exp per logit
        cost_estimate=_cost(2 * b * n * m * (d + c), b * n * m,
                            q, k, v, jax.ShapeDtypeStruct((b, n, c),
                                                          q.dtype)),
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
        # score recompute (2bnmd) + dP (2bnmc) + dQ (2bnmd) +
        # dK (2bnmd) + dV (2bnmc) = 2bnm(3d+2c); one exp per logit
        cost_estimate=_cost(
            2 * b * n * m * (3 * d + 2 * c), b * n * m, q, k, v, g,
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32)),
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# --------------------------------------------------------------------------
# flash path: key-axis blocking for key sets too large for VMEM residence
# --------------------------------------------------------------------------


def _flash_vmem_bytes(bn: int, bm: int, d: int, c: int) -> int:
    """Per-batch-element resident bytes of the flash kernels: ~3 fp32
    [BN, BM] tiles + q/g/o/dq row blocks + k/v/dk/dv key blocks +
    acc/m/l scratch, all at lane-padded widths (see _lanes)."""
    dc = _lanes(d) + _lanes(c)
    tiles = 3 * bn * _lanes(bm) * 4
    rows = 5 * bn * dc * 4
    keys = 4 * bm * dc * 4
    return tiles + rows + keys


def _pick_flash_blocks(n: int, m: int, d: int, c: int):
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        for bn in (512, 256, 128):
            if n % bn == 0 and _flash_vmem_bytes(bn, bm, d, c) <= VMEM_BUDGET:
                return bn, bm
    return 0, 0


# The FORWARD kernel's residency is ~half the backward's (two [BN, BM]
# tiles instead of three, one k/v key-block set instead of k/v + fp32
# dK/dV accumulators), so it can afford larger blocks than the pair the
# backward is safe with.  Measured on the v5e at the 256px G map
# (B=16, N=65536, M=16384, d=2 — tools/bench_attn_floor256.py, round
# 4): the backward-safe pick (BN=256, BM=1024) runs the forward at
# 86.8 ms while (BN=512, BM=2048) runs 65.2 ms — 25% faster and inside
# the stripped-math floor (no-max-correction variant: 65.9 ms).  The
# (512, 2048) forward footprint estimates at ~12.1 MB and compiled/ran
# on hardware, so the forward budget keeps ~2 MB Mosaic headroom of
# the 16 MB/core scoped-VMEM limit instead of the backward's 4 MB.
FWD_VMEM_BUDGET = 14 * 1024 * 1024


def _flash_fwd_vmem_bytes(bn: int, bm: int, d: int, c: int) -> int:
    """Per-batch-element resident bytes of the flash FORWARD kernel:
    two fp32 [BN, BM] tiles (scores s and exponentials e) + the k/v key
    blocks + q/acc/o row blocks + mi/li/lse scalars-per-row, all at
    lane-padded widths (see _lanes)."""
    tiles = 2 * bn * _lanes(bm) * 4
    keys = bm * (_lanes(d) + _lanes(c)) * 4
    rows = bn * (2 * _lanes(c) + _lanes(d) + 3 * 128) * 4
    return tiles + keys + rows


def _pick_flash_blocks_fwd(n: int, m: int, d: int, c: int):
    """Forward-path block pair: largest key block, then largest query
    block, that fits the forward budget.  Strictly more permissive than
    _pick_flash_blocks (smaller estimate, larger budget), so it never
    fails when the backward pick succeeded."""
    for bm in (2048, 1024, 512, 256, 128):
        if m % bm:
            continue
        for bn in (512, 256, 128):
            if n % bn == 0 and \
                    _flash_fwd_vmem_bytes(bn, bm, d, c) <= FWD_VMEM_BUDGET:
                return bn, bm
    return 0, 0


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, mi, li,
                      *, nk):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc[...])
        mi[...] = jnp.full_like(mi[...], -jnp.inf)
        li[...] = jnp.zeros_like(li[...])

    q = q_ref[...]                                 # [G, BN, D]
    k = k_ref[...]                                 # [G, BM, D]
    v = v_ref[...]                                 # [G, BM, C]
    prec = _prec(q.dtype)
    s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=prec)            # [G, BN, BM]
    m_new = jnp.maximum(mi[...], jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(mi[...] - m_new)
    e = jnp.exp(s - m_new)
    li[...] = li[...] * corr + jnp.sum(e, axis=-1, keepdims=True)
    acc[...] = acc[...] * corr + lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)
    mi[...] = m_new

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[...] = (acc[...] / li[...]).astype(o_ref.dtype)
        lse_ref[...] = mi[...] + jnp.log(li[...])


def _flash_fwd(q, k, v, bn, bm, g, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    nk = m // bm
    grid = (b // g, n // bn, nk)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, bn, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm, c), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, bn, c), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            # [B, N, 1]: a trailing unit lane keeps the block shape legal
            # for Mosaic (last two dims must be (8,128)-divisible or
            # equal to the array dims)
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ],
        # QKᵀ + EV per visited tile = 2bnm(d+c); exps: one per logit
        # plus one running-max correction per (row, key-block)
        cost_estimate=_cost(
            2 * b * n * m * (d + c), b * n * (m + nk), q, k, v,
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((g, bn, c), jnp.float32),
            pltpu.VMEM((g, bn, 1), jnp.float32),
            pltpu.VMEM((g, bn, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_dq_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref, dq_ref,
                     dqa, delta, *, nk):
    kidx = pl.program_id(2)
    g = g_ref[...]                                 # [G, BN, C]

    @pl.when(kidx == 0)
    def _():
        dqa[...] = jnp.zeros_like(dqa[...])
        # flash identity: δᵢ = Σⱼ pᵢⱼ dpᵢⱼ = dOᵢ·Oᵢ
        delta[...] = jnp.sum(g.astype(jnp.float32)
                             * o_ref[...].astype(jnp.float32),
                             axis=-1, keepdims=True)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    prec = _prec(q.dtype)
    s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=prec)            # [G, BN, BM]
    p = jnp.exp(s - lse_ref[...])
    dp = lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32,
                         precision=prec)           # [G, BN, BM]
    dlog = (p * (dp - delta[...])).astype(k.dtype)
    dqa[...] += lax.dot_general(dlog, k, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=prec)

    @pl.when(kidx == nk - 1)
    def _():
        dq_ref[...] = dqa[...].astype(dq_ref.dtype)


def _bwd_tile_grads(q, k, v, g, o, lse):
    """Shared backward tile math (used by the two-kernel dK/dV pass and
    the fused one-pass backward — ONE definition so a precision/identity
    fix cannot skew fused-vs-two-kernel parity): recompute the
    [G, BN, BM] score tile, apply the flash identity δ=dO·O, and return
    (p, dlog, prec)."""
    prec = _prec(q.dtype)
    s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=prec)            # [G, BN, BM]
    p = jnp.exp(s - lse)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)        # [G, BN, 1]
    dp = lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32,
                         precision=prec)           # [G, BN, BM]
    dlog = (p * (dp - delta)).astype(k.dtype)
    return p, dlog, prec


def _accum_dkv(nidx, q, g, v_dtype, p, dlog, prec, dk_ref, dv_ref):
    """Zero-init at the first query block, then accumulate this query
    block's dK/dV contributions in place (grid revisits the same output
    block across the innermost query axis)."""
    @pl.when(nidx == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    dk_ref[...] += lax.dot_general(
        dlog, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)
    dv_ref[...] += lax.dot_general(
        p.astype(v_dtype), g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                      dk_ref, dv_ref):
    nidx = pl.program_id(2)
    q = q_ref[...]                                 # [G, BN, D]
    v = v_ref[...]                                 # [G, BM, C]
    g = g_ref[...]                                 # [G, BN, C]
    p, dlog, prec = _bwd_tile_grads(q, k_ref[...], v, g,
                                    o_ref[...], lse_ref[...])
    _accum_dkv(nidx, q, g, v.dtype, p, dlog, prec, dk_ref, dv_ref)


def _flash_bwd(q, k, v, o, lse, g, bn, bm, gb, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    nk = m // bm
    row_specs = [
        pl.BlockSpec((gb, bn, d), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bm, d), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bm, c), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, c), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, c), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, 1), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, nk=nk),
        grid=(b // gb, n // bn, nk),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((gb, bn, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        # score recompute (2bnmd) + dP (2bnmc) + dQ (2bnmd)
        cost_estimate=_cost(
            2 * b * n * m * (2 * d + c), b * n * m, q, k, v, g, o, lse,
            jax.ShapeDtypeStruct((b, n, d), q.dtype)),
        scratch_shapes=[
            pltpu.VMEM((gb, bn, d), jnp.float32),
            pltpu.VMEM((gb, bn, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, g, o, lse)

    # dK/dV: query axis innermost, key-block outputs accumulate in place
    kv_specs = [
        pl.BlockSpec((gb, bn, d), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bm, d), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bm, c), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, c), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, c), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, bn, 1), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        _flash_dkv_kernel,
        grid=(b // gb, m // bm, n // bn),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((gb, bm, d), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bm, c), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ],
        # score recompute (2bnmd) + dP (2bnmc) + dK (2bnmd) + dV (2bnmc)
        cost_estimate=_cost(
            2 * b * n * m * (2 * d + 2 * c), b * n * m, q, k, v, g, o,
            lse, jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32)),
        interpret=interpret,
    )(q, k, v, g, o, lse)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# --------------------------------------------------------------------------
# fused one-pass flash backward
# --------------------------------------------------------------------------

# Budget for the fused backward kernel.  Its worst-case per-element
# estimate at the adopted 256px blocks (BN=512, BM=2048, d=2, c=8) is
# ~14.6 MB — larger than the two-kernel backward budget because the
# fused kernel holds only ONE generation of score tiles (s/p + dp fp32
# + dlog bf16) plus the dK/dV accumulators, and the (512, 2048) config
# compiled and ran on the real v5e (tools/bench_attn_bwd256.py).
# Coverage note: the estimator lane-pads d and c, so EVERY d, c ≤ 128
# picks the same blocks and occupies the same padded VMEM footprint the
# 256px run proved on hardware — the near-limit budget is not an
# extrapolation for those shapes.  Head widths past one 128-lane tile
# (via attn_qk_dim/attn_v_dim) do grow residency; the d=128/c=256
# stress case in tools/pallas_parity.py compiles + runs the picker's
# choice there on the real chip (PARITY_TPU.json).
BWD_FUSED_VMEM_BUDGET = 15 * 1024 * 1024
# HBM cap for the dq partial slab [B, nk, D, N] fp32, counted at the
# laid-out size (D sublane-pads to 8: 268 MB at the 256px training
# shape, exactly 1 GiB at the 512px B=4 shape); shapes past this fall
# back to the two-kernel backward.
DQ_SLAB_LIMIT = 1024 * 1024 * 1024


def _flash_bwd_fused_vmem_bytes(bn: int, bm: int, d: int, c: int,
                                itemsize: int = 2) -> int:
    """Per-batch-element resident bytes of the fused backward kernel:
    two fp32 [BN, BM] tiles (p and dp) + the input-dtype dlog tile +
    k/v key blocks (input dtype) + fp32 dK/dV accumulators + q/g/o row
    blocks (input dtype) + lse + the fp32 dq-partial out block
    ([D, BN], transposed — D sublane-pads to 8, BN is lane-aligned),
    at padded widths (see _lanes/_sublanes).  ``itemsize`` is the
    attention input dtype's byte width (2 for bf16, 4 for fp32) —
    unlike the siblings above, this estimator runs near the budget at
    the adopted 256px blocks, so counting fp32 inputs at 2 bytes would
    overcommit VMEM and fail in the Mosaic pipeline."""
    dc = _lanes(d) + _lanes(c)
    tiles = bn * _lanes(bm) * (4 + 4 + itemsize)
    keys = bm * dc * (itemsize + 4)
    rows = bn * (_lanes(d) + 2 * _lanes(c)) * itemsize + bn * 128 * 4 \
        + _sublanes(d) * _lanes(bn) * 4
    return tiles + keys + rows


def _pick_flash_blocks_bwd_fused(n: int, m: int, d: int, c: int,
                                 itemsize: int = 2):
    """Block pair for the fused one-pass backward, or (0, 0) to fall
    back to the two-kernel path.  BM < 1024 is excluded empirically:
    every BM=512 variant died in the Mosaic pipeline on the v5e
    (tools/bench_attn_bwd256.py round-4 sweep) while all BM≥1024
    configs compiled and ran; the sweep's winner at the 256px shape was
    (BN=512, BM=2048) at 135.7 ms (bf16; fp32 inputs fit (256, 2048))."""
    for bm in (2048, 1024):
        if m % bm or m <= bm:
            continue
        for bn in (512, 256, 128):
            if n % bn == 0 and \
                    _flash_bwd_fused_vmem_bytes(bn, bm, d, c, itemsize) \
                    <= BWD_FUSED_VMEM_BUDGET:
                return bn, bm
    return 0, 0


def _flash_dqkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                       dk_ref, dv_ref, dqp_ref):
    """One-pass backward on the dK/dV grid (batch, key-block,
    query-block): dK/dV accumulate in place across the innermost query
    axis exactly like _flash_dkv_kernel, and the SAME recomputed score
    tile also yields this key block's dq contribution, written to a
    per-key-block slab summed outside by XLA.  One score recompute
    instead of two."""
    nidx = pl.program_id(2)
    q = q_ref[...]                                 # [1, BN, D]
    k = k_ref[...]                                 # [1, BM, D]
    v = v_ref[...]                                 # [1, BM, C]
    g = g_ref[...]                                 # [1, BN, C]
    p, dlog, prec = _bwd_tile_grads(q, k, v, g, o_ref[...], lse_ref[...])
    _accum_dkv(nidx, q, g, v.dtype, p, dlog, prec, dk_ref, dv_ref)
    # dq contribution emitted TRANSPOSED ([1, 1, D, BN], query tokens in
    # the lane axis) by contracting the other way on the MXU: the
    # natural [.., BN, D] layout puts D minor, and the forced
    # major-to-minor HBM layout of a Pallas output lane-pads D → the
    # [B, nk, N, D] slab ballooned 64x at d=2 (256 MB → 16 GB at the
    # 512px shape — a compile-time HBM OOM, and 64x the real write
    # traffic everywhere else).  [B, nk, D, N] only sublane-pads D
    # (2 → 8, 4x), and N is already lane-aligned.
    dqp_ref[...] = lax.dot_general(
        k, dlog, (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)[:, None]


def _flash_bwd_fused(q, k, v, o, lse, g, bn, bm, interpret=False):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    nk = m // bm
    kv_specs = [
        pl.BlockSpec((1, bn, d), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, d), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, c), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, c), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, c), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, 1), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv, dqp = pl.pallas_call(
        _flash_dqkv_kernel,
        grid=(b, m // bm, n // bn),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, c), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, bn), lambda i, mm, j: (i, mm, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, nk, d, n), jnp.float32),
        ],
        # ONE score recompute (2bnmd) + dP (2bnmc) + dQ partials
        # (2bnmd) + dK (2bnmd) + dV (2bnmc) = 2bnm(3d+2c)
        cost_estimate=_cost(
            2 * b * n * m * (3 * d + 2 * c), b * n * m, q, k, v, g, o,
            lse, jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, nk, d, n), jnp.float32)),
        interpret=interpret,
    )(q, k, v, g, o, lse)
    dq = jnp.swapaxes(jnp.sum(dqp, axis=1), 1, 2).astype(q.dtype)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_bwd_dispatch(q, k, v, o, lse, g, bn, bm, gb, interpret):
    """Fused one-pass backward where its picker accepts the shape (the
    flash path always runs gb=1); otherwise the two-kernel backward
    with the caller's backward-safe (bn, bm)."""
    b, n, d = q.shape
    m = k.shape[1]
    if gb == 1:
        fbn, fbm = _pick_flash_blocks_bwd_fused(n, m, d, v.shape[2],
                                                q.dtype.itemsize)
        if fbn and b * (m // fbm) * _sublanes(d) * n * 4 <= DQ_SLAB_LIMIT:
            return _flash_bwd_fused(q, k, v, o, lse, g, fbn, fbm,
                                    interpret)
    return _flash_bwd(q, k, v, o, lse, g, bn, bm, gb, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _attention_flash(q, k, v, bn, bm, fbn, fbm, gb, interpret):
    """(bn, bm) are the backward-safe blocks; (fbn, fbm) the larger
    forward-only blocks (see _pick_flash_blocks_fwd)."""
    o, _lse = _flash_fwd(q, k, v, fbn, fbm, gb, interpret)
    return o


def _attention_flash_fwd(q, k, v, bn, bm, fbn, fbm, gb, interpret):
    o, lse = _flash_fwd(q, k, v, fbn, fbm, gb, interpret)
    return o, (q, k, v, o, lse)


def _attention_flash_bwd(bn, bm, fbn, fbm, gb, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_dispatch(q, k, v, o, lse, g, bn, bm, gb, interpret)


_attention_flash.defvjp(_attention_flash_fwd, _attention_flash_bwd)


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

    Dispatch: the single-pass kernel when the whole key set fits the
    VMEM budget; the flash (key-axis-blocked) kernels when it does not;
    the einsum reference only for untileable shapes."""
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    block_n = _pick_block(n, m, d, c)
    if block_n:
        block_b = _pick_batch_block(b, block_n, m, d, c)
        return _attention_fused(q, k, v, block_n, block_b, interpret)
    bn, bm = _pick_flash_blocks(n, m, d, c)
    if bn:
        fbn, fbm = _pick_flash_blocks_fwd(n, m, d, c)
        return _attention_flash(q, k, v, bn, bm, fbn, fbm, 1, interpret)
    from .attention import attention_reference
    return attention_reference(q, k, v)


# --------------------------------------------------------------------------
# GSPMD batch partitioning (round 3)
# --------------------------------------------------------------------------
#
# Under model parallelism the train step is a single GSPMD-partitioned
# jit program; a bare pallas_call is an opaque custom-call XLA cannot
# partition, so round 2 force-disabled the kernels under mp > 1 and the
# GSPMD path paid the HBM-materialized [N, M] attention cost this file
# exists to remove.  Both kernel families are embarrassingly parallel
# over the batch dim, so we register a batch-dim partitioning rule via
# jax.experimental.custom_partitioning: dim 0 of every operand/result
# shards like the first batch-sharded operand (the "data" mesh axis),
# every other dim is replicated, and the shard-local lowering re-picks
# its batch block from the LOCAL batch size.  No collectives are
# inserted (verified: no all-gather in the partitioned HLO).


def _dim0_spec(arg_shapes):
    for a in arg_shapes:
        s = getattr(a, "sharding", None)
        if s is not None and len(s.spec) and s.spec[0] is not None:
            return s.spec[0]
    return None


def _dim0_shardings(mesh, b, infos):
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.tree.map(
        lambda i: NamedSharding(
            mesh, PartitionSpec(b, *([None] * (len(i.shape) - 1)))),
        infos, is_leaf=lambda x: hasattr(x, "shape"))


def _register_dim0(fn, n_dynamic, rule, need_repl):
    """Wrap ``fn(*arrays, interpret)`` (all arrays leading-batch) with a
    batch-dim GSPMD rule.  ``rule``/``need_repl`` feed the Shardy
    partitioner; the callback pair covers the legacy GSPMD partitioner.
    ``need_repl`` must list factors in first-appearance order (Shardy
    requires sorted special-factor indices)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(fn, static_argnums=(n_dynamic,))

    def partition(interpret, mesh, arg_shapes, result_shape):
        b = _dim0_spec(arg_shapes)

        def lower(*xs):
            return fn(*xs, interpret)

        return (mesh, lower,
                _dim0_shardings(mesh, b, result_shape),
                tuple(_dim0_shardings(mesh, b, a) for a in arg_shapes))

    def infer(interpret, mesh, arg_shapes, result_shape):
        return _dim0_shardings(mesh, _dim0_spec(arg_shapes), result_shape)

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=need_repl)
    return cp


def _fwd_local(q, k, v, interpret):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    block_n = _pick_block(n, m, d, c)
    return _fwd(q, k, v, block_n,
                _pick_batch_block(b, block_n, m, d, c), interpret)


def _bwd_local(q, k, v, g, interpret):
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    block_n = _pick_block(n, m, d, c)
    return _bwd_call(q, k, v, g, block_n,
                     _pick_batch_block(b, block_n, m, d, c), interpret)


def _flash_fwd_local(q, k, v, interpret):
    n, d = q.shape[1:]
    m, c = k.shape[1], v.shape[2]
    bn, bm = _pick_flash_blocks_fwd(n, m, d, c)
    return _flash_fwd(q, k, v, bn, bm, 1, interpret)


def _flash_bwd_local(q, k, v, o, lse, g, interpret):
    n, d = q.shape[1:]
    m, c = k.shape[1], v.shape[2]
    bn, bm = _pick_flash_blocks(n, m, d, c)
    return _flash_bwd_dispatch(q, k, v, o, lse, g, bn, bm, 1, interpret)


_fwd_cp = _register_dim0(
    _fwd_local, 3,
    'B n d, B m d, B m c -> B n c', ('n', 'd', 'm', 'c'))
_bwd_cp = _register_dim0(
    _bwd_local, 4,
    'B n d, B m d, B m c, B n c -> B n d, B m d, B m c',
    ('n', 'd', 'm', 'c'))
_flash_fwd_cp = _register_dim0(
    _flash_fwd_local, 3,
    'B n d, B m d, B m c -> B n c, B n u', ('n', 'd', 'm', 'c', 'u'))
_flash_bwd_cp = _register_dim0(
    _flash_bwd_local, 6,
    'B n d, B m d, B m c, B n c, B n u, B n c -> B n d, B m d, B m c',
    ('n', 'd', 'm', 'c', 'u'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_fused_p(q, k, v, interpret):
    return _fwd_cp(q, k, v, interpret)


def _attention_fused_p_fwd(q, k, v, interpret):
    return _fwd_cp(q, k, v, interpret), (q, k, v)


def _attention_fused_p_bwd(interpret, res, g):
    q, k, v = res
    return _bwd_cp(q, k, v, g, interpret)


_attention_fused_p.defvjp(_attention_fused_p_fwd, _attention_fused_p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_flash_p(q, k, v, interpret):
    o, _lse = _flash_fwd_cp(q, k, v, interpret)
    return o


def _attention_flash_p_fwd(q, k, v, interpret):
    o, lse = _flash_fwd_cp(q, k, v, interpret)
    return o, (q, k, v, o, lse)


def _attention_flash_p_bwd(interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_cp(q, k, v, o, lse, g, interpret)


_attention_flash_p.defvjp(_attention_flash_p_fwd, _attention_flash_p_bwd)


def attention_fused_partitioned(q: jax.Array, k: jax.Array, v: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """``attention_fused`` for GSPMD-partitioned (mp > 1) programs.

    Same kernels, same family dispatch (the family choice depends only
    on N/M/D/C, which partitioning never changes), but each pallas_call
    is wrapped in a batch-dim custom_partitioning rule so the kernels
    run shard-local under the 2-D (data, model) mesh instead of forcing
    a downgrade to the HBM-materialized einsum path."""
    b, n, d = q.shape
    m, c = k.shape[1], v.shape[2]
    if _pick_block(n, m, d, c):
        return _attention_fused_p(q, k, v, interpret)
    bn, _bm = _pick_flash_blocks(n, m, d, c)
    if bn:
        return _attention_flash_p(q, k, v, interpret)
    from .attention import attention_reference
    return attention_reference(q, k, v)
