"""Head-width A/B: does widening attention QK (and V) cost step time?

The 64px floor study (tools/bench_attn_floor.py) proved the attention
kernel is at the machine floor for the REFERENCE widths — church64's
attn32 map runs [N=4096, M=1024] at d=2 (c/8 of 16 channels;
/root/reference/layers.py:89-99 fixes theta/phi at c/8).  d=2 leaves
the MXU's 128-lane contraction almost entirely idle: the systolic array
spends the same cycles on d=2 as on d=128, so the only open church64
perf lever (round-2 conclusion) is MODEL width, not kernel work.

This study measures the full church64 train step at the shipped widths
vs widened ``attn_qk_dim``/``attn_v_dim`` (nn/attention.py extension).
If ms/step is ~flat while parameter count and attention rank grow, the
conclusion is: widening is free capacity on TPU — ship it as the
recommended non-parity variant.

Run:  python tools/bench_attn_qk.py   (ONE process on the real TPU;
numbers land in the printed table — copy conclusions here + README
once measured, like the other tools/ studies).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from bench import CHURCH64, build, measure
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}")

    variants = [
        ("reference (qk=c/8, v=c/2)", {}),
        ("qk=32", {"attn_qk_dim": 32}),
        ("qk=128", {"attn_qk_dim": 128}),
        ("qk=128 v=64", {"attn_qk_dim": 128, "attn_v_dim": 64}),
    ]
    base = dict(CHURCH64, compute_dtype="bfloat16", use_pallas=None,
                steps_per_call=8)
    rows = []
    for name, extra in variants:
        cfg = dict(base, **extra)
        handles = build(cfg)
        sps = measure(*handles, warmup=2, iters=8, reps=3)
        ips = sps * cfg["global_batch_size"]
        rows.append((name, 1000.0 / sps, ips))
        print(f"  {name:28s}: {1000.0 / sps:7.2f} ms/step "
              f"({ips:8.0f} imgs/s)", flush=True)
        handles = None  # release HBM before the next build

    ref = rows[0][1]
    print("\nstep-time ratio vs reference widths:")
    for name, ms, _ in rows:
        print(f"  {name:28s}: {ms / ref:6.3f}x")


if __name__ == "__main__":
    main()
