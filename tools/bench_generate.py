"""Serving throughput/latency study: the generate path on the real TPU.

The reference has no inference entry point (generation happens only as
a training side effect, /root/reference/sagan/main.py:289-320); our
``python -m sagan_tpu.generate`` CLI is the deployment story, so its
performance is a first-class claim.  This study measures, per flagship
model:

* **throughput** — steady-state images/sec of a dispatch-ahead serving
  loop (dispatch batch i+1 before fetching batch i: JAX async dispatch
  overlaps the host fetch with device compute), for the float32 sample
  path vs the device-side-uint8 serve path (``generate.build_serve_fn``
  fetches 4x fewer bytes over the host link);
* **latency** — single cold-batch round trip (dispatch + compute +
  fetch) at a small batch, the interactive-request number.

Run:  python tools/bench_generate.py   (ONE process on the real TPU).
Prints one JSON line per (model, batch, path) plus a summary table;
copy conclusions to README "Serving" once measured.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build_model(config):
    from sagan_tpu.models import get_generator
    gen = get_generator(config)
    vars_g = gen.init(jax.random.PRNGKey(0))
    return gen, vars_g


def serving_loop_imgs_per_sec(fn, vars_g, zs, labels, batch,
                              reps=3) -> float:
    """Best-of-``reps`` imgs/s of the dispatch-ahead loop: dispatch
    every batch, then fetch them in order — the fetch of batch i
    overlaps the device compute of batches i+1.. (device executes
    in dispatch order).  Each rep fetches every output fully (the
    serving contract is images on the host)."""
    outs = [fn(vars_g, z, labels) for z in zs[:2]]
    np.asarray(jax.device_get(outs[-1]))  # warmup + true barrier
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(vars_g, z, labels) for z in zs]
        for o in outs:
            np.asarray(jax.device_get(o))
        dt = time.perf_counter() - t0
        best = max(best, len(zs) * batch / dt)
    return best


def single_batch_latency_ms(fn, vars_g, z, labels, reps=10) -> float:
    """Median round trip of ONE batch: dispatch -> compute -> full
    fetch.  Includes the tunnel RTT — this is what an interactive
    request experiences.  Uses the shared full-fetch timing helper
    (timeit_best's scalar-fetch force would exclude the transfer,
    which is the serving cost being measured here)."""
    from sagan_tpu.utils.timing import timeit_fetch_median_ms
    return timeit_fetch_median_ms(fn, vars_g, z, labels, reps=reps)


def main():
    from bench import CHURCH64, CHURCH256, IMAGENET128
    from sagan_tpu.generate import build_serve_fn
    from sagan_tpu.train.trainer import build_sample_fn
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    models = [
        ("church64", dict(CHURCH64, compute_dtype="bfloat16"),
         [64, 256, 1024]),
        ("imagenet128_gf16", dict(IMAGENET128, compute_dtype="bfloat16"),
         [16, 64, 256]),
        ("imagenet128_gf64", dict(IMAGENET128, gf_dim=64, df_dim=64,
                                  compute_dtype="bfloat16"), [16, 64]),
        ("church256", dict(CHURCH256, compute_dtype="bfloat16"),
         [4, 16, 32]),
    ]
    n_batches = 8
    rows = []
    for name, cfg, batches in models:
        gen, vars_g = build_model(cfg)
        paths = [("float32", build_sample_fn(gen, mesh=None)),
                 ("uint8", build_serve_fn(gen))]
        for batch in batches:
            rng = np.random.default_rng(1)
            zs = [jax.device_put(rng.standard_normal(
                (batch, cfg["z_dim"]), dtype=np.float32))
                for _ in range(n_batches)]
            labels = jnp.zeros((batch,), jnp.int32)
            for pname, fn in paths:
                ips = serving_loop_imgs_per_sec(fn, vars_g, zs, labels,
                                                batch)
                lat = single_batch_latency_ms(fn, vars_g, zs[0], labels)
                row = {"model": name, "img_size": cfg["img_size"],
                       "batch": batch, "path": pname,
                       "imgs_per_sec": round(ips, 1),
                       "latency_ms_per_batch": round(lat, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    print("\nmodel              batch  path     imgs/s    batch-latency",
          file=sys.stderr)
    for r in rows:
        print(f"{r['model']:18s} {r['batch']:5d}  {r['path']:8s}"
              f"{r['imgs_per_sec']:9.1f}    {r['latency_ms_per_batch']:8.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
