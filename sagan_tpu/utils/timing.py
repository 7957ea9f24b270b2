"""Fetch-forced timing helpers — the ONE copy of the measurement
discipline every benchmark must follow on this backend.

``jax.block_until_ready`` does NOT wait for device execution over the
axon-tunneled TPU (verified: a chained 8192³ matmul loop "finished" at
300× chip peak under block_until_ready; the same loop forced by
``jax.device_get`` measured 164 TFLOP/s ≈ 83% of a v5e's bf16 peak,
which is physical).  Only a value fetch is a true barrier, so all
timing fetches a scalar — once per measured rep, so the ~1.5 ms
per-fetch round trip amortizes over ``iters`` chained calls.

Used by bench.py and the tools/bench_*.py studies; keep any new timing
code on these helpers rather than re-implementing the loop.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def force(out):
    """True execution barrier: fetch one scalar from (any leaf of) out."""
    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def timeit_fetch_median_ms(fn, *args, reps: int = 10) -> float:
    """Median milliseconds of ONE dispatch → compute → **full fetch**
    round trip of ``fn(*args)`` (every output byte via
    ``jax.device_get``, not the one-scalar ``force``).

    This is the SERVING metric: when the deliverable is the array on
    the host (tools/bench_generate.py), the transfer is part of the
    measured cost, so ``timeit_best``'s scalar-fetch amortization
    would exclude exactly the thing being optimized.  Median, not
    best-of: an interactive request experiences the typical tunnel
    RTT, not the luckiest."""
    fetch = lambda: np.asarray(jax.device_get(fn(*args)))  # noqa: E731
    fetch()  # warmup (compile + first-touch)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def timeit_best(fn, *args, iters: int = 30, reps: int = 3,
                jit: bool = True) -> float:
    """Best-of-``reps`` mean seconds per call of ``fn(*args)``.

    Jits ``fn`` (unless pre-compiled), warms it up, then times ``reps``
    batches of ``iters`` chained calls, forcing execution once per
    batch.  Best-of because the tunneled chip's throughput is ±30%
    noisy run-to-run — the max-throughput sample is the
    least-contended one (compare variants within one process only).
    """
    j = jax.jit(fn) if jit else fn
    force(j(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = j(*args)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
