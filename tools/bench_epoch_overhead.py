"""On-TPU study: where does end-to-end training throughput go vs the
bench-measured device step rate?

bench.py measures the church64 step at ~8.7k imgs/s on the chip, but
the committed end-to-end church64 TFRecord run sustains ~6.5k
(artifacts/church64_tfrecord/run_indexed.log) with the device-resident
cache — i.e. ~25% of the device rate disappears into the epoch loop.
Candidates: the per-summary observability work that runs ON the
critical path (fixed-latent sample grid: a G forward dispatch + a
~0.8 MB image fetch over the remote tunnel + PNG/TB encode + flush,
all while the device pipeline drains), the per-summary metric fetch
barrier itself, and per-call dispatch overhead.

Variants (run sequentially within ONE process — same XLA programs and
compile cache; NOT interleaved per-epoch, so cross-variant deltas
smaller than the chip's run-to-run noise are not resolvable.  The
per-variant steady mean uses epochs >= 2 only):
  full       — the committed artifact behavior (writer on, grids on)
  no_grid    — writer on, scalar summaries on, in-loop image grid off
  no_summary — no writer, summary cadence effectively off (the pure
               train loop; upper bound = bench step rate minus
               per-call dispatch)

Prints one JSON line per (variant, epoch) plus a per-variant summary
(mean imgs/s over epochs >= 2, first epochs pay compile).

Usage: python tools/bench_epoch_overhead.py [epochs=6]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402


def run_variant(name: str, epochs: int, tmp: str) -> list:
    """Fresh Trainer per variant (state is donated); returns per-epoch
    imgs/s parsed from the trainer's own fetch-forced epoch stats."""
    from sagan_tpu.train.trainer import Trainer
    from sagan_tpu.utils.config import load_config_file, resolve_config

    cfg = load_config_file("artifacts/church64_tfrecord/run_config.py")
    cfg.update({
        "epoch": epochs,
        "ckpt_dir": None,           # checkpoint saves are epoch-END work
        "img_dir": None,            # (not in the timed window) — drop to
                                    # isolate the in-loop costs
        "print_variables": False,
    })
    if name == "full":
        cfg["log_dir"] = os.path.join(tmp, "logs_full")
    elif name == "no_grid":
        cfg["log_dir"] = os.path.join(tmp, "logs_nogrid")
    elif name == "no_summary":
        cfg["log_dir"] = None
        cfg["summary_step_freq"] = 1 << 30
    else:
        raise ValueError(name)
    tr = Trainer(resolve_config(cfg))
    if name == "no_grid":
        import jax.numpy as jnp

        s = tr.ds_train.img_size
        # neutralize the in-loop grid with a DEVICE zeros array: a host
        # ndarray here would raise inside _start_host_copies and
        # permanently disable the async metric copies, silently changing
        # what this variant measures
        zeros = jnp.zeros((tr.fixed_z.shape[0], s, s, 3), jnp.float32)
        host_zeros = np.asarray(zeros)
        tr.sample_images_device = lambda: zeros  # type: ignore[method-assign]
        tr.sample_images = lambda: host_zeros  # type: ignore[method-assign]
    rates: list = []
    orig_print = print

    # scrape the trainer's per-epoch "(N imgs/s" stdout lines
    import builtins

    def capture(*args, **kw):
        text = " ".join(str(a) for a in args)
        orig_print(*args, **kw)
        if "imgs/s" in text:
            rates.append(float(text.split("(")[-1].split(" imgs/s")[0]))

    builtins.print = capture
    try:
        tr.train()
    finally:
        builtins.print = orig_print
    return rates


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import tempfile

    tmp = tempfile.mkdtemp(prefix="epoch_overhead_")
    out = {}
    for name in ("full", "no_grid", "no_summary"):
        rates = run_variant(name, epochs, tmp)
        for i, r in enumerate(rates):
            print(json.dumps({"variant": name, "epoch": i,
                              "imgs_per_sec": r}), flush=True)
        steady = rates[2:] or rates
        out[name] = round(float(np.mean(steady)), 1)
        print(json.dumps({"variant": name,
                          "mean_imgs_per_sec_steady": out[name]}),
              flush=True)
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
