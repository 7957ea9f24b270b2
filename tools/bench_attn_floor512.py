"""Block-pick validation + floor study for the 512px flash shape.

The 256px study (tools/bench_attn_floor256.py) found the forward
picker 25% off the machine floor at [B=16, N=65536, M=16384] and
motivated the fused one-pass backward; VERDICT r4 item 4 asks for the
same characterization one shape further out — [B=4, N=262144,
M=65536, d=2, c=8], the generator's 512 map in
example_configs/church512_attn.py — where the picks were so far chosen
by the same heuristics with no on-hardware validation.

Sections (each prints a table; nothing is appended):

  fwd/blocks      (BN, BM) sweep around the shipped forward pick,
                  INCLUDING BM=4096 (M=65536 admits a key block the
                  256px shape never could; the shipped picker tops out
                  at 2048 — is that a 512px loss?)
  fwd/floors      stripped-math bounds (noexp / nomaxcorr, wrong math)
                  at the best measured pick
  bwd/fused       (BN, BM) sweep of the fused one-pass backward; the
                  dq-slab HBM cap rejects BM=1024 here (2 GiB slab),
                  so the sweep covers BM ∈ {2048, 4096}
  bwd/slab-share  fused kernel alone vs kernel + the XLA slab
                  reduction (what the transposed [B, nk, D, N] slab
                  costs at its 1 GiB / 512 MiB laid-out sizes)
  bwd/two-kernel  the fallback backward at its own picks (the fused
                  path's margin at this shape)
  step/segments   full church512 train step with vs without attention
                  (bench.CHURCH512) — attention share of the step

Run:  python tools/bench_attn_floor512.py   (ONE process on the real
TPU; ~15-30 min cold, minutes warm via the compile cache).

MEASURED (v5e, round 5 — /tmp/r5/floor512.log; adopted conclusions in
the README Performance section):

  fwd block sweep    shipped (BN=512, BM=2048) 237.84 ms; best
                     (BN=512, BM=4096) 237.28 ms — a 0.2% tie: the
                     shipped forward pick is VALIDATED at 512px, no
                     retune (BM=4096 adopted nowhere; the win is noise)
  fwd floors         noexp 194.99 ms, nomaxcorr 194.10 ms — the
                     remaining 43 ms over the stripped floor is the
                     exp itself (18% of the forward), which correct
                     math must pay: no forward headroom left
  bwd/fused sweep    shipped (BN=512, BM=2048) 436.51 ms best;
                     (256, 2048) 461.09 ms; both BM=4096 variants die
                     in the Mosaic pipeline (VMEM) — the shipped
                     fused-bwd pick is VALIDATED at 512px
  bwd/slab share     the 1 GiB transposed dq slab's XLA reduction
                     costs 0.42 ms = 0.1% of the fused backward — the
                     slab design is free at this scale
  bwd/two-kernel     822.62 ms — the fused one-pass backward is a 47%
                     cut at 512px (vs 36% at 256px: the bigger M makes
                     the saved score recompute worth more)
  step/segments      attention = 97.3% of the 512px step (929.6 vs
                     25.0 ms/step without attention); fwd+bwd kernel
                     times (2×237.8 + 436.5 = 912 ms) account for the
                     differential — nothing else at this scale matters
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sagan_tpu.ops.pallas_attention import (
    DQ_SLAB_LIMIT, _flash_bwd, _flash_bwd_fused, _flash_fwd,
    _pick_flash_blocks, _pick_flash_blocks_bwd_fused,
    _pick_flash_blocks_fwd, _sublanes)
from sagan_tpu.utils.timing import timeit_best

B, N, M, D, C = 4, 262144, 65536, 2, 8
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
    bn0, bm0 = _pick_flash_blocks_fwd(N, M, D, C)
    print(f"shipped forward picks: BN={bn0} BM={bm0}")
    results = {}
    sweep = sorted({(bn0, bm0)} | {(bn, bm) for bn in (256, 512)
                                   for bm in (1024, 2048, 4096)})
    for bn, bm in sweep:
        if N % bn or M % bm:
            continue
        try:
            t = timeit_best(
                lambda q, k, v, bn=bn, bm=bm: _flash_fwd(
                    q, k, v, bn, bm, 1)[0], q, k, v, iters=5)
        except Exception as e:
            print(f"  fwd BN={bn} BM={bm}: failed ({type(e).__name__})",
                  flush=True)
            continue
        results[(bn, bm)] = t
        tag = " <- shipped" if (bn, bm) == (bn0, bm0) else ""
        print(f"  fwd BN={bn} BM={bm}: {t * 1e3:8.2f} ms{tag}",
              flush=True)
    if not results:
        # every variant failed: report and keep the study going with
        # the shipped picks so the backward/step sections still run
        # (same guard as the 256px study's sweep)
        print("  fwd blocks: ALL variants failed; using shipped picks")
        return (bn0, bm0), results
    best = min(results, key=results.get)
    print(f"  best: BN={best[0]} BM={best[1]} {results[best] * 1e3:.2f} ms "
          f"(shipped {results.get((bn0, bm0), float('nan')) * 1e3:.2f} ms)")
    return best, results


def bench_floors(bn, bm):
    # reuse the 256px study's stripped-math kernels at this shape
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tools.bench_attn_floor256 import _floor_kernel

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
        try:
            t = timeit_best(fn, q, k, v, iters=5, jit=True)
        except Exception as e:
            print(f"  fwd/{mode}: failed ({type(e).__name__})", flush=True)
            continue
        out[mode] = t
        print(f"  fwd/{mode} (floor, wrong math): {t * 1e3:8.2f} ms",
              flush=True)
    return out


def bench_bwd_fused():
    q, k, v, g = _data()
    fbn0, fbm0 = _pick_flash_blocks_fwd(N, M, D, C)
    o, lse = jax.jit(
        lambda q, k, v: _flash_fwd(q, k, v, fbn0, fbm0, 1))(q, k, v)
    bn0, bm0 = _pick_flash_blocks_bwd_fused(N, M, D, C, 2)
    print(f"shipped fused-bwd picks: BN={bn0} BM={bm0}")
    results = {}
    for bn, bm in sorted({(bn0, bm0)} | {(bn, bm) for bn in (256, 512)
                                         for bm in (2048, 4096)}):
        if not bn or N % bn or M % bm:
            continue
        slab = B * (M // bm) * _sublanes(D) * N * 4
        if slab > DQ_SLAB_LIMIT:
            print(f"  fused BN={bn} BM={bm}: slab {slab / 2**30:.1f} GiB "
                  f"over cap, skipped")
            continue
        try:
            t = timeit_best(
                lambda q, k, v, o, lse, g, bn=bn, bm=bm: _flash_bwd_fused(
                    q, k, v, o, lse, g, bn, bm), q, k, v, o, lse, g,
                iters=5)
        except Exception as e:
            print(f"  fused BN={bn} BM={bm}: failed ({type(e).__name__})",
                  flush=True)
            continue
        results[(bn, bm)] = t
        tag = " <- shipped" if (bn, bm) == (bn0, bm0) else ""
        print(f"  fused BN={bn} BM={bm} (slab {slab / 2**30:.2f} GiB): "
              f"{t * 1e3:8.2f} ms{tag}", flush=True)

    if results:
        best = min(results, key=results.get)
        # slab share at the best pick: kernel+sum (full) vs a variant
        # whose dq is taken pre-reduction (kernel cost only; wrong
        # output, timing-only)
        bn, bm = best
        t_full = results[best]

        def kernel_only(q, k, v, o, lse, g):
            # dropping dq DCEs only the XLA slab REDUCTION (the
            # pallas_call still writes all three outputs, slab
            # included), so t_full - t_kernel isolates the reduction
            dq, dk, dv = _flash_bwd_fused(q, k, v, o, lse, g, bn, bm)
            return dk, dv

        t_kernel = timeit_best(kernel_only, q, k, v, o, lse, g, iters=5)
        print(f"  slab reduction share at BN={bn} BM={bm}: "
              f"{(t_full - t_kernel) * 1e3:8.2f} ms "
              f"({(t_full - t_kernel) / t_full:.1%} of fused bwd)")
    return results


def bench_bwd_two_kernel():
    q, k, v, g = _data()
    bn, bm = _pick_flash_blocks(N, M, D, C)
    fbn, fbm = _pick_flash_blocks_fwd(N, M, D, C)
    o, lse = jax.jit(
        lambda q, k, v: _flash_fwd(q, k, v, fbn, fbm, 1))(q, k, v)
    try:
        t = timeit_best(
            lambda q, k, v, o, lse, g: _flash_bwd(
                q, k, v, o, lse, g, bn, bm, 1), q, k, v, o, lse, g,
            iters=5)
        print(f"  bwd/two-kernel (BN={bn} BM={bm}): {t * 1e3:8.2f} ms")
        return t
    except Exception as e:
        print(f"  bwd/two-kernel: failed ({type(e).__name__}: {e})")
        return None


def bench_step_segments():
    from bench import CHURCH512, build, measure

    out = {}
    for attn in (True, False):
        cfg = dict(CHURCH512, compute_dtype="bfloat16",
                   use_pallas=True if attn else None,
                   use_attention=attn, steps_per_call=2)
        handles = build(cfg)
        sps = measure(*handles, warmup=2, iters=5, reps=2)
        out[attn] = 1000.0 / sps
        print(f"  step ({'with' if attn else 'no  '} attention): "
              f"{out[attn]:8.2f} ms/step", flush=True)
    print(f"  attention share of the 512px step: "
          f"{1.0 - out[False] / out[True]:.1%}")
    return out


def main():
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}  shape B={B} N={N} M={M} d={D} c={C}")

    print("== forward block sweep ==", flush=True)
    (bn, bm), _ = bench_fwd_blocks()
    print("== stripped-math floors ==", flush=True)
    bench_floors(bn, bm)
    print("== fused one-pass backward sweep + slab share ==", flush=True)
    bench_bwd_fused()
    print("== two-kernel backward (fallback) ==", flush=True)
    bench_bwd_two_kernel()
    print("== full-step segments ==", flush=True)
    bench_step_segments()


if __name__ == "__main__":
    main()
