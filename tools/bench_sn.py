"""Decide the fused Pallas spectral-norm kernel's fate on real hardware:
measure the full church64 train step with use_pallas_sn on vs off,
interleaved in one process (chip throughput is ±30% noisy across
processes).  Also measures the isolated SN transform for every model
weight shape.

Usage: python tools/bench_sn.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import CHURCH64, build, measure

from sagan_tpu.utils.timing import timeit_best


def bench_train_step():
    base = dict(CHURCH64, compute_dtype="bfloat16", steps_per_call=8)
    xla_h = build(dict(base, use_pallas_sn=False))
    pal_h = build(dict(base, use_pallas_sn=True))
    best_x = best_p = 0.0
    for _ in range(3):
        best_x = max(best_x, measure(*xla_h, reps=1))
        best_p = max(best_p, measure(*pal_h, reps=1))
    return best_x, best_p


def bench_isolated():
    """Per-shape SN transform latency, fused vs XLA (jitted, µs)."""
    from tools.pallas_parity import sn_weight_shapes

    from sagan_tpu.ops.pallas_spectral import spectral_normalize_fused
    from sagan_tpu.ops.spectral import spectral_normalize_xla

    rows = []
    for shape in sn_weight_shapes():
        w = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        u = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],))
        u = u / jnp.linalg.norm(u)
        for name, fn in (("xla", spectral_normalize_xla),
                         ("pallas", spectral_normalize_fused)):
            # fetch-forced: block_until_ready is NOT a barrier on this
            # backend (CLAUDE.md) — timeit_best forces a value fetch
            f = jax.jit(lambda w, u, fn=fn: fn(w, u, n_iter=1))
            us = timeit_best(f, w, u, iters=100, jit=False) * 1e6
            rows.append({"shape": list(shape), "backend": name,
                         "us_per_call": round(us, 1)})
            print(f"SN {shape} {name}: {us:.1f} us", flush=True)
    return rows


def main():
    best_x, best_p = bench_train_step()
    b = CHURCH64["global_batch_size"]
    print(json.dumps({
        "train_step_imgs_per_sec": {"xla_sn": round(best_x * b, 1),
                                    "pallas_sn": round(best_p * b, 1)},
        "pallas_over_xla": round(best_p / best_x, 4),
        "isolated": bench_isolated(),
        "device_kind": jax.devices()[0].device_kind,
    }, indent=1))


if __name__ == "__main__":
    main()
