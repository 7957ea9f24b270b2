"""Measure what the serving batch ladder buys for small requests.

VERDICT r4 item 6 ("an n=1 /sample at --batch 64 pays the full
64-image program") was closed in round 5 by compiling a ladder of
batch shapes and serving requests by largest-fitting chunks
(sagan_tpu/serve.py).  This tool measures the claim's money number on
the real TPU: per-request latency of small /sample sizes on a
--batch 64 church64 server, ladder ON (1, 8, 64) vs ladder OFF
(the pre-round-5 whole-batch behavior), same process, same weights.

Latency is the full service path the HTTP handler runs — latent draw,
device program(s), uint8 fetch — via GeneratorService.sample, median
of ``reps`` (a request experiences typical tunnel RTT, not the
luckiest; see utils/timing.timeit_fetch_median_ms).

Run:  python tools/bench_serve_ladder.py   (ONE process on the TPU;
two service startups = up to 4 serve-program compiles, warm via the
cache).

MEASURED (v5e, round 5 — /tmp/r5/serve_ladder.log; median of 15):

    n     no ladder -> ladder(1,8,64)
    1      137.9    ->   36.4 ms   (3.8x)
    7      209.2    ->   78.6 ms   (2.7x)   [one sliced 8-program]
    8      142.5    ->   48.3 ms   (3.0x)
    16     225.8    ->  143.7 ms   (1.6x)   [8+8]
    63     196.5    ->  142.7 ms   (1.4x)   [one sliced 64-program]
    64     153.7    ->  178.8 ms   (0.9x)   [identical program; noise]

  The gain is bounded well under batch/n because a tunneled request's
  latency floor is the dispatch+fetch round trip, not chip compute —
  but 3.8x on n=1 and >2.5x on every sub-rung size is exactly the
  small-request win the ladder exists for, with full-batch requests
  unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


CFG = {
    "dataset": "synthetic", "data_path": "unused",
    "model": "vanilla", "z_dim": 128, "gf_dim": 16, "df_dim": 16,
    "img_size": 64, "use_attention": True, "attn_dim_G": [32, 64],
    "attn_dim_D": [8, 4], "use_label": False, "num_classes": 1,
    "batch_size": 64, "num_devices": 1, "lr_g": 2e-4, "lr_d": 7e-4,
    "decay_rate": 0.99, "compute_dtype": "bfloat16",
}


def median_latency_ms(svc, n, reps=15):
    # the ONE timing loop (CLAUDE.md): sample() is internally
    # fetch-forced (device_get of every output byte), exactly the
    # serving-metric contract timeit_fetch_median_ms encodes
    from sagan_tpu.utils.timing import timeit_fetch_median_ms

    return timeit_fetch_median_ms(
        lambda: svc.sample(n, seed=0, class_id=-1, truncation=0.0),
        reps=reps)


def main():
    import jax

    from sagan_tpu.models import get_generator
    from sagan_tpu.serve import GeneratorService
    from sagan_tpu.utils.config import resolve_config
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}  church64 gf16, --batch 64")

    cfg = resolve_config(dict(CFG), num_local_devices=1)
    gen = get_generator(cfg)
    eval_vars = gen.init(jax.random.PRNGKey(0))

    rows = {}
    for name, ladder in (("ladder(1,8,64)", (1, 8)), ("no ladder", ())):
        svc = GeneratorService(gen, eval_vars, z_dim=cfg["z_dim"],
                               num_classes=1, batch=64, ladder=ladder)
        print(f"-- {name}: compiled sizes {svc.ladder}")
        # 7 and 63 are the tail cases: just under a rung, where the
        # chunker must run ONE sliced next-rung program, not
        # remainder-many unit programs
        for n in (1, 7, 8, 16, 63, 64):
            ms = median_latency_ms(svc, n)
            rows[(name, n)] = ms
            print(f"   n={n:3d}: {ms:8.2f} ms/request  "
                  f"(computed {svc.images_computed_total} imgs total)",
                  flush=True)

    print("\nspeedup from the ladder (per-request latency, median):")
    for n in (1, 7, 8, 16, 63, 64):
        a, b = rows[("ladder(1,8,64)", n)], rows[("no ladder", n)]
        print(f"   n={n:3d}: {b:7.2f} -> {a:7.2f} ms  ({b / a:4.1f}x)")


if __name__ == "__main__":
    main()
