"""Host-side data-loader throughput vs the train step's demand.

The church64 step consumes ~8.7k imgs/s per chip (README Performance);
the loader must sustain that or training is host-bound (observed in
round 2's real-training runs, ROUNDLOG).  This tool measures the
TFRecord pipeline (native C++ reader + thread merge + shuffle + batch +
prefetch, data/loader.py) in isolation: imgs/s over full epochs, first
epoch (cold read) and second epoch (OS page cache / in-memory cache
warm) reported separately.

Usage:
    python tools/bench_loader.py data/church64_tfrecord \
        [--batch 64] [--workers 4] [--epochs 2] [--no_cache]

Prints one JSON line per epoch plus a summary verdict against the
demand (--demand, default 8700 imgs/s).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.data.loader import ImageDataset  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_path")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--demand", type=float, default=8700.0,
                    help="imgs/s the train step consumes (church64)")
    ap.add_argument("--no_cache", action="store_true",
                    help="disable the in-memory decoded cache")
    args = ap.parse_args(argv)

    ds = ImageDataset(args.data_path, batch_size=args.batch,
                      num_workers=args.workers,
                      cache_in_memory=False if args.no_cache else None)
    rates = []
    for epoch in range(args.epochs):
        n = 0
        t0 = time.perf_counter()
        for images, labels in ds.epoch(epoch):
            n += images.shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        rates.append(rate)
        print(json.dumps({
            "epoch": epoch, "images": n, "seconds": round(dt, 2),
            "imgs_per_sec": round(rate, 1),
            "cache": "memory" if ds.cache_in_memory else "none",
            "workers": args.workers,
        }), flush=True)
    best = max(rates)
    print(json.dumps({
        "summary": "loader_vs_step_demand",
        "best_imgs_per_sec": round(best, 1),
        "demand_imgs_per_sec": args.demand,
        "sustains_demand": best >= args.demand,
        "headroom": round(best / args.demand, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
