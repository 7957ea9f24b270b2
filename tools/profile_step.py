"""Op-level profile of a benchmark config's train step on the real chip.

Wraps ``jax.profiler`` around a few steady-state steps of one of
bench.py's configs and prints the top device ops by aggregate self time
from the captured trace — the quick "where do the milliseconds go"
view without spinning up TensorBoard.  (The trainer's ``profile_dir``
config key captures the same trace for full TensorBoard analysis;
SURVEY.md §5 notes the reference has no profiling at all.)

Usage:
    python tools/profile_step.py [church64|imagenet128|gf64] [--top N]
            [--keep-trace DIR]

Example (imagenet128_cond, v5e): the distribution is a flat tail of
~0.1-0.4 ms conv/fusion kernels — no single hot op — confirming the
gf16 model's 15.7% MFU is architectural (tiny channel widths at 128px),
not one bad kernel.
"""
import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="imagenet128",
                    choices=("church64", "imagenet128", "gf64"))
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep-trace", default=None,
                    help="keep the raw trace under this directory")
    args = ap.parse_args()

    import importlib
    bench = importlib.import_module("bench")
    base = {
        "church64": dict(bench.CHURCH64, steps_per_call=8),
        "imagenet128": dict(bench.IMAGENET128, steps_per_call=4),
        "gf64": dict(bench.IMAGENET128, gf_dim=64, df_dim=64,
                     steps_per_call=4),
    }[args.config]
    config = dict(base, compute_dtype="bfloat16", use_pallas=None)

    step, state, images, labels = bench.build(config)
    state = jax.tree.map(jnp.copy, state)
    for _ in range(3):
        state, m = step(state, images, labels)
    float(jax.device_get(m["G_loss"]))

    if args.keep_trace:
        # never clear a user-supplied directory; write a fresh subdir
        trace_dir = os.path.join(args.keep_trace,
                                 f"profile_{args.config}_{os.getpid()}")
    else:
        trace_dir = "/tmp/sagan_tpu_profile"
        shutil.rmtree(trace_dir, ignore_errors=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, images, labels)
    float(jax.device_get(m["G_loss"]))
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    calls = 3 * config.get("steps_per_call", 1)
    agg = {}
    for path in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            # keep compiled-computation events; drop python/host frames
            if name.startswith("$") or name.startswith("jit_") or \
                    "PjitFunction" in name or name.startswith("np."):
                continue
            entry = agg.setdefault(name, [0, 0])
            entry[0] += ev.get("dur", 0)
            entry[1] += 1
    print(f"config={args.config}  {wall:.2f}s traced "
          f"({calls} train steps)  top {args.top} device ops:")
    for name, (dur, cnt) in sorted(agg.items(),
                                   key=lambda kv: -kv[1][0])[:args.top]:
        print(f"{dur/1e3:9.2f} ms total  {dur/1e3/calls:7.3f} ms/step "
              f" x{cnt:4d}  {name[:80]}")
    if not args.keep_trace:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
