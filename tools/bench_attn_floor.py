"""Speed-of-light study for the fused attention kernel's hot shape.

The church64 train step is 85% attention (differential timing: 7.33 ms
full vs 1.11 ms with ``use_attention: False``), so the headline
imgs/sec rides on this one kernel at [B=64, N=4096, M=1024, d=2, c=8]
(the 64x64 map of the gf16 generator, 4x-downsampled K/V —
/root/reference/layers.py:94-116 semantics).  This script times forward
-kernel variants that each remove or re-route one candidate bottleneck:

  current        the shipped kernel (ops/pallas_attention.py v2)
  vpu_scores     QK^T as VPU broadcast-FMA (d=2 -> 2 FMAs/element)
                 instead of a 64x-lane-padded MXU dot
  exp2           exp(x) -> exp2(x*log2e) (cheaper transcendental?)
  nomax          drop the running-max subtraction (one fewer pass)
  noexp(floor)   no transcendental at all (NOT correct math — floor)
  ev_vpu         E.V contraction as C per-channel VPU row-reductions
  blocks         block_n in {256..2048} x batch-block in {1,2,4}
                 (grid steps 128..512), fp32 vs bf16 probability tiles

Measured on a real v5e (2026-08-17, fetch-forced — see
CLAUDE.md on block_until_ready):

  current 1.878 ms | vpu_scores 1.928 | exp2 2.013 | nomax 1.805 |
  noexp 1.893 | ev_vpu 2.857 | block/dtype sweep 1.84-2.11 ms

The backward was probed the same way: a variant fed the forward's saved
row-max/row-sum (skipping both recompute reduce passes) runs at 0.90x —
slower, the extra [BN,1] input streams outweigh the saved reductions —
so the flash-style recompute backward is likewise at its floor.

Round 3 added the one *algebraic* lever the round-2 study had not tried
(VERDICT r2 #2): computing the logits as X·(WθWφᵀ)·X̄ᵀ — identical
pre-softmax math to (XWθ)(X̄Wφ)ᵀ, but the [N,M] contraction runs at
dim Cin=16 instead of d=2 and Q/K are never materialized.  Measured
(same process, same tokens, 2026-08-17):

  current fed projected q/k : 2.017 ms
  folded X(WθWφᵀ)X̄ᵀ        : 2.072 ms   (corr 0.99995 vs current)

NEGATIVE RESULT, closing the question: the folded form is within noise
of the current kernel (and the folded kernel additionally absorbs the
theta/phi projection matmuls, which the current step pays separately —
still no win).  The contraction dim does not matter at these shapes;
the cost is streaming the 2.7e8-position [N,M] score tile through the
VPU/MXU, which both forms pay identically.  The "machine floor" claim
now covers the algebraic decomposition too.

Conclusion: the kernel is at the machine floor for this shape.  The
cost is NOT the exp (removing it entirely changes nothing), NOT the
lane-padded MXU dots (computing scores on the VPU instead is neutral),
NOT pipeline overhead (4x fewer grid steps is neutral), and NOT tile
precision.  Feeding 2.7e8 score positions through any engine at this
degenerate head dim (d = C/8 = 2) costs ~1.9 ms on a v5e; the shipped
kernel is within measurement noise of every stripped-down variant.
Further church64 throughput requires changing the model (bigger head
dims amortize the [N,M] traffic), not the kernel.

Run: python tools/bench_attn_floor.py   (one real-TPU process; ~5 min
warm via the compilation cache).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from sagan_tpu.utils.timing import timeit_best

B, N, M, D, C = 64, 4096, 1024, 2, 8
LOG2E = 1.4426950408889634


def _call(kernel, bn=512, g=1):
    return pl.pallas_call(
        kernel, grid=(B // g, N // bn),
        in_specs=[
            pl.BlockSpec((g, bn, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, M, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, M, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bn, C), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.bfloat16))


def k_current(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_vpu_scores(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    logits = qf[:, :, 0:1] * kf[:, :, 0][:, None, :]
    for dd in range(1, D):
        logits += qf[:, :, dd:dd + 1] * kf[:, :, dd][:, None, :]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_exp2(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp2(logits * LOG2E - mx * LOG2E)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_nomax(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    e = jnp.exp(logits)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_noexp(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = logits - mx
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_e16(q_ref, k_ref, v_ref, o_ref):
    # probability tile cast to bf16 immediately after the exp (halves
    # the tile bytes the EV contraction and row-sum touch)
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx).astype(jnp.bfloat16)
    l = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = lax.dot_general(e, v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _call_folded(kernel, bn=512, g=1, cin=16):
    """pallas_call wiring for the projection-folded variant: inputs are
    the RAW tokens x [B,N,Cin], xb [B,M,Cin] plus the folded [Cin,Cin]
    product W = Wθ Wφᵀ (grid-invariant), v as before."""
    return pl.pallas_call(
        kernel, grid=(B // g, N // bn),
        in_specs=[
            pl.BlockSpec((g, bn, cin), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, M, cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, M, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bn, C), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.bfloat16))


def k_folded(x_ref, xb_ref, w_ref, v_ref, o_ref):
    """VERDICT r2 #2: logits as X·(WθWφᵀ)·X̄ᵀ — identical pre-softmax
    math to q·kᵀ with q=XWθ, k=X̄Wφ, but the [N,M] contraction runs at
    dim Cin=16 instead of d=2 and Q/K are never materialized."""
    x, xb, v = x_ref[...], xb_ref[...], v_ref[...]
    w = w_ref[...]
    s = x.shape
    xw = lax.dot_general(x.reshape(s[0] * s[1], s[2]), w,
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    xw = xw.reshape(s)
    logits = lax.dot_general(xw.astype(xb.dtype), xb,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_ev_vpu(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    logits = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    l = jnp.sum(e, axis=-1, keepdims=True)
    vf = v.astype(jnp.float32)
    cols = [jnp.sum(e * vf[:, :, cc][:, None, :], axis=-1, keepdims=True)
            for cc in range(C)]
    o = jnp.concatenate(cols, axis=-1)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def timeit(name, fn, *args, iters=30):
    try:
        j = jax.jit(fn)
        out = j(*args)
    except Exception as ex:
        print(f"{name:24s}: FAILED {type(ex).__name__}", flush=True)
        return None
    best = timeit_best(j, *args, iters=iters, jit=False)
    print(f"{name:24s}: {best * 1e3:7.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, M, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, M, C)), jnp.bfloat16)

    ref = timeit("current", _call(k_current), q, k, v)
    for name, kern in [("vpu_scores", k_vpu_scores), ("exp2", k_exp2),
                       ("nomax", k_nomax), ("noexp(floor)", k_noexp),
                       ("bf16_tiles", k_e16), ("ev_vpu", k_ev_vpu)]:
        out = timeit(name, _call(kern), q, k, v)
        if out is not None and name != "noexp(floor)":
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"{'':24s}  max abs diff vs current: {err:.2e}",
                  flush=True)
    for bn, g in [(1024, 1), (512, 2), (2048, 1), (1024, 2), (256, 4)]:
        steps = (B // g) * (N // bn)
        timeit(f"blocks bn={bn} g={g} ({steps})", _call(k_current, bn, g),
               q, k, v)

    # ---- projection-folded logits (VERDICT r2 #2) ----------------------
    # X·(WθWφᵀ)·X̄ᵀ vs (XWθ)(X̄Wφ)ᵀ: same pre-softmax math, contraction
    # at Cin=16 instead of d=2, Q/K never materialized.  Timed against
    # the current kernel fed the projected q/k of the SAME tokens, and
    # cross-checked numerically.
    cin = 16
    x = jnp.asarray(rng.standard_normal((B, N, cin)), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((B, M, cin)), jnp.bfloat16)
    wth = jnp.asarray(rng.standard_normal((cin, D)) / np.sqrt(cin),
                      jnp.bfloat16)
    wph = jnp.asarray(rng.standard_normal((cin, D)) / np.sqrt(cin),
                      jnp.bfloat16)
    wfold = jnp.asarray(
        np.asarray(wth, np.float32) @ np.asarray(wph, np.float32).T,
        jnp.bfloat16)

    @jax.jit
    def project(x, xb, wth, wph):
        qp = lax.dot_general(x, wth, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        kp = lax.dot_general(xb, wph, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        return qp.astype(jnp.bfloat16), kp.astype(jnp.bfloat16)

    qp, kp = project(x, xb, wth, wph)
    out_proj = timeit("current(projected q/k)", _call(k_current), qp, kp, v)
    out_fold = timeit("folded X(WW')X'", _call_folded(k_folded, cin=cin),
                      x, xb, wfold, v)
    if out_fold is not None and out_proj is not None:
        a = np.asarray(out_fold, np.float32)
        b = np.asarray(out_proj, np.float32)
        print(f"{'':24s}  folded vs projected max abs diff: "
              f"{np.max(np.abs(a - b)):.2e}  corr: "
              f"{np.corrcoef(a.ravel(), b.ravel())[0, 1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
