"""Speed-of-light study for the FLASH attention path at the 256px shape.

The 64px study (tools/bench_attn_floor.py) proved the single-pass
kernel is at the machine floor for [B=64, N=4096, M=1024, d=2, c=8].
This one covers the 256px flash regime — [B=16, N=65536, M=16384,
d=2, c=8], the generator's 256 map in artifacts/church256_flash —
where the key set no longer fits VMEM and the key-axis-blocked flash
kernels (ops/pallas_attention.py) carry the step.  VERDICT r3 item 2
asked for exactly this: a floor study here plus a prototype of the
projection mega-kernel (folding the θ/φ 1×1 convs into the kernel),
which at 64px was a measured negative.

Variants:
  fwd/current        shipped flash forward at the shipped block picks
  fwd/blocks         (BN, BM) sweep — is the shipped pick the fastest?
  fwd/noexp(floor)   transcendental replaced by a multiply (NOT correct
                     math): bounds how much of the time is exp
  fwd/nomaxcorr      drop the online running-max correction (NOT safe
                     math — fixed max 0): bounds the online-softmax
                     bookkeeping cost
  fwd/folded_proj    the projection mega-kernel: feed raw X [N, Cin]
                     and X̄ [M, Cin] with W = WθWφᵀ [Cin, Cin] and
                     Wg [Cin, c]; logits = (X W) X̄ᵀ computed in-kernel,
                     V = X̄ Wg in-kernel — the θ/φ/g projections never
                     materialize Q/K/V in HBM.  Timed against
                     (current + the three XLA projection matmuls) so the
                     comparison includes everything the fold absorbs.
  bwd/current        shipped flash backward (dq + dkv kernels)
  bwd/split          dq-only and dkv-only timings (where do the 2
                     score recomputes go?)
  step/segments      full church256 train-step differential:
                     use_attention True vs False (what fraction of the
                     step is attention at all)

Run:  python tools/bench_attn_floor256.py   (ONE process on the real
TPU; ~10-20 min cold, minutes warm via the compile cache).  Appends
nothing; prints a table.

MEASURED (v5e, round 4 — artifacts/church256_flash/floor256_study.log):

  fwd block sweep    shipped (BN=256, BM=1024) 86.8 ms; best
                     (BN=512, BM=2048) 65.2 ms → forward picker split
                     from the backward picker and retuned (adopted:
                     _pick_flash_blocks_fwd)
  fwd floors         noexp 70.2 ms, nomaxcorr 65.9 ms → the retuned
                     forward (65.2 ms) is INSIDE the stripped-math
                     floor band; no forward headroom left
  folded_proj        106.9 ms vs 86.6 ms unfolded+XLA-proj → the
                     projection mega-kernel is a measured NEGATIVE at
                     256px too (score-tile traffic re-paid per key
                     block); closed at both scales
  bwd/current        213.4 ms (dq 91.0 + dkv 130.7) → motivated the
                     fused one-pass backward (tools/bench_attn_bwd256.py,
                     adopted: 135.7 ms, −36%)
  step/segments      attention = 96.3% of the 256px step
                     (400.6 vs 15.0 ms/step with attention off)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sagan_tpu.ops.pallas_attention import (_flash_bwd, _flash_fwd,
                                            _pick_flash_blocks)
from sagan_tpu.utils.timing import timeit_best

B, N, M, D, C = 16, 65536, 16384, 2, 8
CIN = 16  # channels of the 256 map in the gf16 generator (X -> θ/φ/g)
DT = jnp.bfloat16


def _data(key=0):
    rng = np.random.default_rng(key)
    q = jnp.asarray(rng.standard_normal((B, N, D)), DT)
    k = jnp.asarray(rng.standard_normal((B, M, D)), DT)
    v = jnp.asarray(rng.standard_normal((B, M, C)), DT)
    g = jnp.asarray(rng.standard_normal((B, N, C)), DT)
    return q, k, v, g


def bench_fwd_blocks():
    q, k, v, _ = _data()
    bn0, bm0 = _pick_flash_blocks(N, M, D, C)
    print(f"shipped flash picks: BN={bn0} BM={bm0}")
    results = {}
    # always include the shipped pick in the sweep: _pick_flash_blocks
    # can fall through to smaller blocks than the hand-chosen grid, and
    # the comparison is anchored on the shipped row actually measuring
    sweep = sorted({(bn0, bm0)} | {(bn, bm) for bn in (256, 512)
                                   for bm in (512, 1024, 2048)})
    for bn, bm in sweep:
        if N % bn or M % bm:
            continue
        try:
            t = timeit_best(
                lambda q, k, v, bn=bn, bm=bm: _flash_fwd(
                    q, k, v, bn, bm, 1)[0], q, k, v, iters=5)
        except Exception as e:
            print(f"  fwd BN={bn} BM={bm}: failed ({type(e).__name__})")
            continue
        results[(bn, bm)] = t
        tag = " <- shipped" if (bn, bm) == (bn0, bm0) else ""
        print(f"  fwd BN={bn} BM={bm}: {t * 1e3:8.2f} ms{tag}",
              flush=True)
    if not results:
        # every variant failed (e.g. VMEM overflow at an untested
        # shape): report and keep the study going — the floors/folded/
        # bwd sections must still get their one TPU slot
        print("  fwd blocks: ALL variants failed; skipping comparison")
        return None, None
    best = min(results, key=results.get)
    print(f"  best: BN={best[0]} BM={best[1]} {results[best] * 1e3:.2f} ms")
    return results.get((bn0, bm0)), results[best]


# --- stripped-math floors (NOT correct attention) --------------------------


def _floor_kernel(q_ref, k_ref, v_ref, o_ref, acc, mi, li, *, nk, mode):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc[...])
        mi[...] = jnp.full_like(mi[...], -jnp.inf)
        li[...] = jnp.zeros_like(li[...])

    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    if mode == "noexp":
        # transcendental replaced by one multiply — floor, wrong math
        m_new = jnp.maximum(mi[...], jnp.max(s, axis=-1, keepdims=True))
        corr = mi[...] - m_new + 1.0
        e = s * 0.5
    else:  # nomaxcorr: fixed max 0, no correction pass — wrong math
        m_new = mi[...]
        corr = jnp.ones_like(mi[...])
        e = jnp.exp(s)
    li[...] = li[...] * corr + jnp.sum(e, axis=-1, keepdims=True)
    acc[...] = acc[...] * corr + lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    mi[...] = m_new

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[...] = (acc[...] / li[...]).astype(o_ref.dtype)


def bench_floors(bn, bm):
    q, k, v, _ = _data()
    nk = M // bm
    out = {}
    for mode in ("noexp", "nomaxcorr"):
        fn = pl.pallas_call(
            functools.partial(_floor_kernel, nk=nk, mode=mode),
            grid=(B, N // bn, nk),
            in_specs=[
                pl.BlockSpec((1, bn, D), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm, D), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm, C), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn, C), lambda i, j, kk: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
            scratch_shapes=[
                pltpu.VMEM((1, bn, C), jnp.float32),
                pltpu.VMEM((1, bn, 1), jnp.float32),
                pltpu.VMEM((1, bn, 1), jnp.float32),
            ],
        )
        t = timeit_best(fn, q, k, v, iters=5, jit=True)
        out[mode] = t
        print(f"  fwd/{mode} (floor, wrong math): {t * 1e3:8.2f} ms",
              flush=True)
    return out


# --- projection mega-kernel -------------------------------------------------


def _folded_kernel(x_ref, xb_ref, w_ref, wg_ref, o_ref, acc, mi, li, *, nk):
    """Flash forward fed RAW features: logits = (X W) X̄ᵀ with
    W = WθWφᵀ [CIN, CIN]; V = X̄ Wg computed in-kernel.  The θ/φ/g
    projections never write Q/K/V to HBM."""
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc[...])
        mi[...] = jnp.full_like(mi[...], -jnp.inf)
        li[...] = jnp.zeros_like(li[...])

    x = x_ref[...]                                  # [1, BN, CIN]
    xb = xb_ref[...]                                # [1, BM, CIN]
    w = w_ref[...]                                  # [CIN, CIN]
    wg = wg_ref[...]                                # [CIN, C]
    xw = lax.dot_general(x, w[None], (((2,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    s = lax.dot_general(xw.astype(x.dtype), xb,
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    vv = lax.dot_general(xb, wg[None], (((2,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32).astype(x.dtype)
    m_new = jnp.maximum(mi[...], jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(mi[...] - m_new)
    e = jnp.exp(s - m_new)
    li[...] = li[...] * corr + jnp.sum(e, axis=-1, keepdims=True)
    acc[...] = acc[...] * corr + lax.dot_general(
        e.astype(x.dtype), vv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    mi[...] = m_new

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[...] = (acc[...] / li[...]).astype(o_ref.dtype)


def bench_folded(bn, bm):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N, CIN)), DT)
    xb = jnp.asarray(rng.standard_normal((B, M, CIN)), DT)
    wt = jnp.asarray(rng.standard_normal((CIN, D)) * 0.25, DT)
    wp = jnp.asarray(rng.standard_normal((CIN, D)) * 0.25, DT)
    wg = jnp.asarray(rng.standard_normal((CIN, C)) * 0.25, DT)
    w = (wt.astype(jnp.float32) @ wp.astype(jnp.float32).T).astype(DT)

    nk = M // bm
    folded = pl.pallas_call(
        functools.partial(_folded_kernel, nk=nk),
        grid=(B, N // bn, nk),
        in_specs=[
            pl.BlockSpec((1, bn, CIN), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, CIN), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, CIN), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, C), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, C), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
        scratch_shapes=[
            pltpu.VMEM((1, bn, C), jnp.float32),
            pltpu.VMEM((1, bn, 1), jnp.float32),
            pltpu.VMEM((1, bn, 1), jnp.float32),
        ],
    )

    def unfolded(x, xb, wt, wp, wg):
        # what the step actually pays today: three XLA projections +
        # the shipped flash forward
        q = (x @ wt.astype(x.dtype))
        k = (xb @ wp.astype(xb.dtype))
        v = (xb @ wg.astype(xb.dtype))
        return _flash_fwd(q, k, v, bn, bm, 1)[0]

    t_folded = timeit_best(folded, x, xb, w, wg, iters=5, jit=True)
    t_unfolded = timeit_best(unfolded, x, xb, wt, wp, wg, iters=5)
    print(f"  fwd/folded_proj mega-kernel : {t_folded * 1e3:8.2f} ms")
    print(f"  fwd/current + XLA proj      : {t_unfolded * 1e3:8.2f} ms")

    # numerics: the two forms compute identical attention
    o_f = np.asarray(jax.jit(folded)(x, xb, w, wg), np.float32)
    o_u = np.asarray(jax.jit(unfolded)(x, xb, wt, wp, wg), np.float32)
    corr = np.corrcoef(o_f.ravel(), o_u.ravel())[0, 1]
    print(f"  folded vs unfolded corr     : {corr:.6f}")
    return t_folded, t_unfolded


def bench_bwd(bn, bm):
    q, k, v, g = _data()
    o, lse = jax.jit(lambda q, k, v: _flash_fwd(q, k, v, bn, bm, 1))(q, k, v)

    t_full = timeit_best(
        lambda q, k, v, o, lse, g: _flash_bwd(q, k, v, o, lse, g, bn, bm, 1),
        q, k, v, o, lse, g, iters=5)
    print(f"  bwd/current (dq+dkv): {t_full * 1e3:8.2f} ms", flush=True)

    # split: time the two backward kernels separately (each owns one
    # full score recompute pass) — reproduce _flash_bwd's two
    # pallas_calls individually
    from sagan_tpu.ops import pallas_attention as pa

    nk = M // bm
    row_specs = [
        pl.BlockSpec((1, bn, D), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, D), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, C), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, C), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, C), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, 1), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq_call = pl.pallas_call(
        functools.partial(pa._flash_dq_kernel, nk=nk),
        grid=(B, N // bn, nk),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((1, bn, D), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), DT),
        scratch_shapes=[
            pltpu.VMEM((1, bn, D), jnp.float32),
            pltpu.VMEM((1, bn, 1), jnp.float32),
        ],
    )
    kv_specs = [
        pl.BlockSpec((1, bn, D), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, D), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, C), lambda i, mm, j: (i, mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, C), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, C), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, 1), lambda i, mm, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dkv_call = pl.pallas_call(
        pa._flash_dkv_kernel,
        grid=(B, M // bm, N // bn),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, bm, D), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, C), lambda i, mm, j: (i, mm, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, D), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        ],
    )
    t_dq = timeit_best(dq_call, q, k, v, g, o, lse, iters=5, jit=True)
    t_dkv = timeit_best(dkv_call, q, k, v, g, o, lse, iters=5, jit=True)
    print(f"  bwd/dq only         : {t_dq * 1e3:8.2f} ms")
    print(f"  bwd/dkv only        : {t_dkv * 1e3:8.2f} ms")
    return t_full, t_dq, t_dkv


def bench_step_segments():
    """Full church256 train step with vs without attention."""
    from bench import CHURCH256, build, measure

    out = {}
    for attn in (True, False):
        cfg = dict(CHURCH256, compute_dtype="bfloat16",
                   use_pallas=True if attn else None,
                   use_attention=attn, steps_per_call=4)
        handles = build(cfg)
        sps = measure(*handles, warmup=2, iters=5, reps=2)
        out[attn] = 1000.0 / sps
        print(f"  step ({'with' if attn else 'no  '} attention): "
              f"{out[attn]:8.2f} ms/step", flush=True)
    frac = 1.0 - out[False] / out[True]
    print(f"  attention share of the 256px step: {frac:.1%}")
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}  shape B={B} N={N} M={M} d={D} c={C}")

    bn, bm = _pick_flash_blocks(N, M, D, C)
    print("== forward block sweep ==")
    bench_fwd_blocks()
    print("== stripped-math floors ==")
    bench_floors(bn, bm)
    print("== projection mega-kernel (VERDICT r3 item 2 candidate) ==")
    bench_folded(bn, bm)
    print("== backward ==")
    bench_bwd(bn, bm)
    print("== full-step segments ==")
    bench_step_segments()


if __name__ == "__main__":
    main()
