"""Backward flash-attention study at the 256px shape (round 4).

tools/bench_attn_floor256.py retuned the FORWARD blocks
(86.8 -> 65.2 ms, at the stripped-math floor) but never swept the
backward, which at 213 ms (dq 91 + dkv 131, BN=256/BM=1024) now
carries ~2/3 of the 256px attention time — and the 256px step is 96.3%
attention.  Two candidates, in ascending ambition:

  dq/blocks    (BN, BM) sweep of the shipped _flash_dq_kernel: its
               residency differs from dkv's (fp32 dq accumulator per
               query block vs fp32 dK/dV accumulators per key block),
               so like the forward it may afford larger blocks than
               the shared backward-safe pair.
  dkv/blocks   same sweep for _flash_dkv_kernel.
  fused dqkv   one-pass backward: both shipped kernels recompute the
               full [N, M] score tile (s, p, dp) independently.  The
               fused kernel keeps the dkv grid (key blocks outer,
               query blocks inner; dK/dV accumulate in place) and ALSO
               emits per-key-block dq partial slabs [B, nk, N, D] that
               one XLA reduction sums afterwards.  Extra HBM traffic:
               nk * N * D fp32 written + read = ~67 MB each way at the
               256px shape, ~0.2 ms at v5e HBM bandwidth — against a
               saved ~90 ms second score-recompute pass.

Numerics: the fused kernel is checked against the shipped two-kernel
_flash_bwd to fp32-accumulation tolerance before timing is reported.

MEASURED (v5e, round 4 — artifacts/church256_flash/bwd256_study.log):
two-kernel anchor (BN=256, BM=1024) 213.4 ms; best retuned separate
kernels dq 80.2 + dkv 106.1 = 186.3 ms; best fused (BN=512, BM=2048)
**135.7 ms** — ADOPTED as _flash_bwd_fused in ops/pallas_attention.py
(dispatched by _flash_bwd_dispatch; every BM=512 fused variant died in
the Mosaic pipeline, hence the picker's BM ≥ 1024 floor).

FOLLOW-UP (this round): the shipped fused kernel now emits the dq slab
transposed [B, nk, D, N] — the [.., N, D] layout here lane-padded D=2
to 128 (64x the HBM bytes/traffic) — and measures 114.8 ms at this
shape (tools/bench_dq_slab_layout.py).  This script's local kernels
keep the original layout for the historical record.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from sagan_tpu.ops import pallas_attention as pa  # noqa: E402
from sagan_tpu.ops.pallas_attention import (_flash_bwd, _flash_fwd,  # noqa: E402
                                            _pick_flash_blocks, _prec)
from sagan_tpu.utils.timing import timeit_best  # noqa: E402

B, N, M, D, C = 16, 65536, 16384, 2, 8
DT = jnp.bfloat16

SWEEP_BN = (128, 256, 512)
SWEEP_BM = (512, 1024, 2048)


def _data(key=0):
    rng = np.random.default_rng(key)
    q = jnp.asarray(rng.standard_normal((B, N, D)), DT)
    k = jnp.asarray(rng.standard_normal((B, M, D)), DT)
    v = jnp.asarray(rng.standard_normal((B, M, C)), DT)
    g = jnp.asarray(rng.standard_normal((B, N, C)), DT)
    return q, k, v, g


def _dq_call(bn, bm):
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
    return pl.pallas_call(
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


def _dkv_call(bn, bm):
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
    return pl.pallas_call(
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


def _sweep(name, make_call, args):
    results = {}
    for bn in SWEEP_BN:
        if N % bn:
            continue
        for bm in SWEEP_BM:
            if M % bm:
                continue
            try:
                t = timeit_best(make_call(bn, bm), *args, iters=5,
                                jit=True)
            except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
                print(f"  {name} BN={bn} BM={bm}: failed "
                      f"({type(e).__name__})", flush=True)
                continue
            results[(bn, bm)] = t
            print(f"  {name} BN={bn} BM={bm}: {t * 1e3:8.2f} ms",
                  flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"  best {name}: BN={best[0]} BM={best[1]} "
              f"{results[best] * 1e3:.2f} ms")
    return results


# --- fused one-pass backward (the shipped kernel) ---------------------------

_fused_bwd = pa._flash_bwd_fused


def bench_fused(q, k, v, o, lse, g, bn0, bm0):
    # numerics vs the shipped two-kernel backward first
    ref = jax.jit(lambda *a: _flash_bwd(*a, bn0, bm0, 1))(q, k, v, o, lse, g)
    results = {}
    for bn in SWEEP_BN:
        if N % bn:
            continue
        for bm in SWEEP_BM:
            if M % bm:
                continue
            fn = lambda q, k, v, o, lse, g, bn=bn, bm=bm: _fused_bwd(
                q, k, v, o, lse, g, bn, bm)
            try:
                out = jax.jit(fn)(q, k, v, o, lse, g)
                errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                              - b.astype(jnp.float32))))
                        for a, b in zip(out, ref)]
                t = timeit_best(fn, q, k, v, o, lse, g, iters=5)
            except Exception as e:  # noqa: BLE001
                print(f"  fused BN={bn} BM={bm}: failed "
                      f"({type(e).__name__})", flush=True)
                continue
            results[(bn, bm)] = t
            print(f"  fused BN={bn} BM={bm}: {t * 1e3:8.2f} ms  "
                  f"max|Δ| dq/dk/dv = "
                  f"{errs[0]:.2e}/{errs[1]:.2e}/{errs[2]:.2e}",
                  flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"  best fused: BN={best[0]} BM={best[1]} "
              f"{results[best] * 1e3:.2f} ms")
    return results


def main():
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}  shape B={B} N={N} M={M} d={D} c={C}")

    bn0, bm0 = _pick_flash_blocks(N, M, D, C)
    q, k, v, g = _data()
    o, lse = jax.jit(
        lambda q, k, v: _flash_fwd(q, k, v, bn0, bm0, 1))(q, k, v)
    print(f"shipped backward blocks: BN={bn0} BM={bm0}")

    print("== dq block sweep ==")
    _sweep("dq ", _dq_call, (q, k, v, g, o, lse))
    print("== dkv block sweep ==")
    _sweep("dkv", _dkv_call, (q, k, v, g, o, lse))
    print("== fused one-pass backward (dq slabs + dkv) ==")
    bench_fused(q, k, v, o, lse, g, bn0, bm0)
    print("== shipped two-kernel backward (anchor) ==")
    t = timeit_best(
        lambda *a: _flash_bwd(*a, bn0, bm0, 1), q, k, v, o, lse, g,
        iters=5)
    print(f"  bwd/current (dq+dkv): {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
