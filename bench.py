"""Benchmark: SAGAN train-step throughput on the local accelerator.

Measures steady-state imgs/sec of the full church64 training step (D + G
updates, spectral norm, attention, cross-replica-ready BN) on
device-resident data — the hot path ranked in SURVEY.md §3.2.

``vs_baseline`` is the speedup over a reference-style *naive* variant run
in the same process on the same chip: fp32 compute, unfused einsum
attention, no buffer donation — i.e. a faithful-but-unoptimized JAX
transcription of the TF2 reference's numerics (the reference itself
publishes no numbers to compare against; BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec", "vs_baseline": R}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build(config):
    from sagan_tpu.models import get_discriminator, get_generator
    from sagan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from sagan_tpu.train.optim import make_gan_optimizers
    from sagan_tpu.train.trainer import TrainState, build_train_step

    mesh = make_mesh(config["num_devices"])
    gen = get_generator(config)
    disc = get_discriminator(config)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(config, steps_per_epoch=100)
    key = jax.random.PRNGKey(0)
    vars_g = gen.init(key)
    vars_d = disc.init(jax.random.fold_in(key, 1))
    state = TrainState(
        vars_g=vars_g, vars_d=vars_d,
        opt_g=opt_g.init(vars_g["params"]),
        opt_d=opt_d.init(vars_d["params"]),
        step=jnp.int32(0), rng=jax.random.fold_in(key, 2))
    state = replicate(mesh, state)
    step = build_train_step(gen, disc, opt_g, opt_d, config, mesh)

    rng = np.random.default_rng(0)
    b = config["global_batch_size"]
    s = config["img_size"]
    k = config.get("steps_per_call", 1)
    images = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    labels = rng.integers(0, max(1, config.get("num_classes", 1)), (b,),
                          dtype=np.int32)
    if k > 1:
        from sagan_tpu.parallel.mesh import stacked_batch_sharding
        sh = stacked_batch_sharding(mesh)
        images = jax.device_put(np.stack([images] * k), sh)
        labels = jax.device_put(np.stack([labels] * k), sh)
    else:
        images, labels = shard_batch(mesh, images, labels)
    return step, state, images, labels


def measure(step, state, images, labels, warmup=5, iters=30, reps=3):
    """Best-of-``reps`` steady-state steps/sec (the tunneled chip's
    throughput is noisy run-to-run; max is the least-contended sample).
    Stacked [K, B, ...] batches count as K steps per call."""
    k = images.shape[0] if images.ndim == 5 else 1
    # the step donates its state argument: run on a private copy so the
    # caller's handle stays valid across repeated measure() calls
    state = jax.tree.map(jnp.copy, state)
    for _ in range(warmup):
        state, metrics = step(state, images, labels)
    jax.block_until_ready(metrics)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, images, labels)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        best = max(best, iters * k / dt)
    return best  # steps/sec


def main():
    base = {
        "model": "vanilla",
        "z_dim": 128,
        "gf_dim": 16,
        "df_dim": 16,
        "img_size": 64,
        "use_attention": True,
        "attn_dim_G": [32, 64],
        "attn_dim_D": [8, 4],
        "use_label": False,
        "num_classes": 1,
        "lr_g": 2e-4,
        "lr_d": 7e-4,
        "decay_rate": 0.99,
        "update_ratio": 1,
        "loss": "hinge_loss",
        "num_devices": 1,
        "batch_size": 64,
        "global_batch_size": 64,
    }

    optimized = dict(base, compute_dtype="bfloat16", use_pallas=None,
                     steps_per_call=8)
    naive = dict(base, compute_dtype="float32", use_pallas=False,
                 fuse_d_batches=False)

    opt_h = build(optimized)
    naive_h = build(naive)
    # interleave reps so chip-throughput drift hits both variants equally
    best_opt = best_naive = 0.0
    for _ in range(3):
        best_opt = max(best_opt, measure(*opt_h, reps=1))
        best_naive = max(best_naive, measure(*naive_h, reps=1))
    imgs_per_sec = best_opt * base["global_batch_size"]
    naive_imgs = best_naive * base["global_batch_size"]

    print(json.dumps({
        "metric": "sagan_church64_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / naive_imgs, 3),
    }))


if __name__ == "__main__":
    main()
