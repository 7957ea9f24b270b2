"""Remat batch-scaling study at 256px (round 4).

Question: what does ``remat: True`` (per-stage jax.checkpoint,
nn/module.py::remat_span) buy at the 256px flash-attention scale, where
per-stage activation maps dominate HBM?  For each batch size and remat
setting this script compiles the full fused train step (bench.py's
church256 config), reports the compiled per-device memory footprint
(XLA memory_analysis when the backend exposes it), and measures
fetch-forced step time — so the committed conclusion is
"remat unlocks batch B at X imgs/s" or an honest negative.

Run on the real TPU (ONE process at a time):
    python tools/bench_remat256.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import CHURCH256, build, measure  # noqa: E402

BATCHES = (16, 32, 64)


def main():
    from sagan_tpu.utils.device import wait_for_devices
    dev = wait_for_devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    rows = []
    for batch in BATCHES:
        for remat in (False, True):
            cfg = dict(CHURCH256, batch_size=batch, global_batch_size=batch,
                       remat=remat, compute_dtype="bfloat16",
                       steps_per_call=2)
            tag = f"B={batch} remat={'on ' if remat else 'off'}"
            try:
                step, state, images, labels = build(cfg)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"  {tag}: BUILD FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                rows.append((batch, remat, None, None))
                continue
            mem_gb = None
            try:
                mem = step.lower(state, images,
                                 labels).compile().memory_analysis()
                mem_gb = (mem.temp_size_in_bytes
                          + mem.argument_size_in_bytes) / 2**30
            except Exception:
                pass
            try:
                steps_per_sec = measure(step, state, images, labels,
                                        warmup=2, iters=5, reps=3)
            except Exception as e:  # noqa: BLE001
                print(f"  {tag}: RUN FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                rows.append((batch, remat, mem_gb, None))
                continue
            ms = 1000.0 / steps_per_sec
            imgs = batch * steps_per_sec
            memtxt = f" mem={mem_gb:.2f} GiB" if mem_gb else ""
            print(f"  {tag}: {ms:8.2f} ms/step ({imgs:7.1f} imgs/s)"
                  f"{memtxt}", flush=True)
            rows.append((batch, remat, mem_gb, ms))

    print("\nsummary (256px church, ms/step, fetch-forced):")
    for batch, remat, mem_gb, ms in rows:
        status = f"{ms:.1f} ms" if ms else "FAILED"
        memtxt = f", {mem_gb:.2f} GiB" if mem_gb else ""
        print(f"  B={batch:3d} remat={'on ' if remat else 'off'}: "
              f"{status}{memtxt}")


if __name__ == "__main__":
    main()
