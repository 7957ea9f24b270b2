"""On-TPU microbench: BatchNorm batch-moment computation variants.

The gf64 profile (`tools/profile_step.py gf64`) shows paired
``convert_reduce_fusion`` device ops at near-identical times — the
mean and E[x²] reductions of ``nn/layers.py::_batch_moments`` running
as TWO separate HBM passes over the activation.  BN statistics are pure
bandwidth; at gf64's 128px ladder the largest activation is
[64,128,128,64] (268 MB bf16), so each extra pass costs ~0.3-1 ms.

Variants measured (fwd + grad, fetch-forced, best-of-5):
  two_pass   — jnp.mean(x) + jnp.mean(x**2) as separate reductions
               (the shipped form)
  variadic   — one lax.reduce with a (sum, sumsq) carry: a single pass
               by construction

MEASURED CONCLUSION (TPU v5e, 2026-08-17) — **negative result, keep
the shipped two-pass form**: XLA lowers the variadic tuple-reduce
catastrophically (28 GB/s effective vs 328 GB/s at [64,128,128,64];
11.6× slower end-to-end), winning only at the smallest, least
important shape.  The sibling mean/mean-sq reductions are already
near the bandwidth floor: full BN fwd+bwd at the largest gf64
activation (134 MB bf16) measures 1.64 ms ≈ 1.6× the ~1 ms
six-HBM-pass floor, so the entire remaining headroom across all of
G's BN sites is well under 2 ms of the 85.7 ms gf64 step.  The gf64
generator's 37% vs 51% MFU gap vs D is architectural bandwidth
(cond-BN is inherently memory-bound at these widths), not a missing
fusion.

Usage: python tools/bench_bn_moments.py
Prints one JSON line per (shape, variant) plus a verdict.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.utils.timing import timeit_best  # noqa: E402
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def moments_two_pass(x):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=axes)
    return mean, jnp.maximum(mean_sq - jnp.square(mean), 0.0)


def moments_variadic(x):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[a] for a in axes]))
    s1, s2 = lax.reduce((x32, jnp.square(x32)), (jnp.float32(0), jnp.float32(0)),
                        lambda a, b: (a[0] + b[0], a[1] + b[1]), axes)
    mean = s1 / n
    return mean, jnp.maximum(s2 / n - jnp.square(mean), 0.0)


def bn_fwd(moments):
    def f(x, gamma, beta):
        mean, var = moments(x)
        inv = lax.rsqrt(var + 1e-3)
        y = (x.astype(jnp.float32) - mean) * inv * gamma + beta
        # scalar loss so grad covers the backward reductions too
        return jnp.sum(y.astype(x.dtype).astype(jnp.float32))
    return f




def main():
    rng = np.random.default_rng(0)
    shapes = [(64, 128, 128, 64), (64, 64, 64, 128), (64, 32, 32, 256),
              (64, 16, 16, 512)]
    variants = {"two_pass": moments_two_pass, "variadic": moments_variadic}
    results = {}
    for shape in shapes:
        x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
        gamma = jnp.ones((shape[-1],), jnp.float32)
        beta = jnp.zeros((shape[-1],), jnp.float32)
        for name, mom in variants.items():
            f = jax.jit(jax.value_and_grad(bn_fwd(mom)))

            def run(x=x, gamma=gamma, beta=beta, f=f):
                v, g = f(x, gamma, beta)
                return v

            dt = timeit_best(run, iters=30, reps=5, jit=False)
            gb = x.size * 2 / 1e9
            results[(shape, name)] = dt
            print(json.dumps({
                "shape": list(shape), "variant": name,
                "ms": round(dt * 1e3, 4),
                "eff_gb_per_s_per_pass": round(gb / dt * 4, 1),
            }), flush=True)
    wins = sum(results[(s, "variadic")] < results[(s, "two_pass")]
               for s in shapes)
    print(json.dumps({"verdict": f"variadic wins {wins}/{len(shapes)}"}))


if __name__ == "__main__":
    main()
