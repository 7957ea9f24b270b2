"""Gradient-accumulation tests: micro-batched grads average to one
optimizer update (effective batch = config batch, activation memory
batch/accum) on both the shard_map and GSPMD paths.

Extension beyond the reference (which has no accumulation): how the
pod-scale batch-2048 configs (example_configs/biggan128_pod.py) run on
small slices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.data.synthetic import make_synthetic_dataset
from sagan_tpu.models import get_discriminator, get_generator
from sagan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from sagan_tpu.train.optim import make_gan_optimizers
from sagan_tpu.train.trainer import Trainer, TrainState, build_train_step
from sagan_tpu.utils.config import resolve_config

BASE = {
    "model": "vanilla", "z_dim": 8, "gf_dim": 8, "df_dim": 8,
    "img_size": 16, "use_attention": True, "attn_dim_G": [8],
    "attn_dim_D": [8], "use_label": False, "num_classes": 1,
    "compute_dtype": "float32", "lr_g": 2e-4, "lr_d": 7e-4,
    "decay_rate": 0.99, "update_ratio": 2, "loss": "hinge_loss",
    "global_batch_size": 16, "use_pallas": False,
}


def _build(cfg, n_devices=2):
    mesh = make_mesh(n_devices)
    gen = get_generator(cfg)
    disc = get_discriminator(cfg)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(cfg, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)
    vars_g = gen.init(key)
    vars_d = disc.init(jax.random.fold_in(key, 1))
    state = TrainState(
        vars_g=vars_g, vars_d=vars_d,
        opt_g=opt_g.init(vars_g["params"]),
        opt_d=opt_d.init(vars_d["params"]),
        step=jnp.int32(0), rng=jax.random.fold_in(key, 2))
    state = replicate(mesh, state)
    step = build_train_step(gen, disc, opt_g, opt_d, cfg, mesh)
    return mesh, state, step


def _batch(mesh, seed=0):
    rng = np.random.default_rng(seed)
    return shard_batch(
        mesh, rng.integers(0, 255, (16, 16, 16, 3), dtype=np.uint8),
        rng.integers(0, 1, (16,), dtype=np.int32))


def test_accum_trains_and_tracks_unaccumulated():
    losses = {}
    for accum in (1, 4):
        mesh, state, step = _build(dict(BASE, grad_accum_steps=accum))
        im, lb = _batch(mesh)
        state, m = step(state, im, lb)
        g, d = float(m["G_loss"]), float(m["D_loss"])
        assert np.isfinite(g) and np.isfinite(d)
        assert int(jax.device_get(state.step)) == 1
        losses[accum] = (g, d)
    # same effective batch and step structure: losses land in the same
    # regime (micro-RNG/BN differ, so not bitwise — just same ballpark)
    assert abs(losses[1][1] - losses[4][1]) < 0.5, losses


def test_accum_must_divide_per_replica_batch():
    # 16 global / 2 devices = 8 per replica; accum=3 does not divide it
    mesh, state, step = _build(dict(BASE, grad_accum_steps=3))
    im, lb = _batch(mesh)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        step(state, im, lb)


def test_accum_composes_with_steps_per_call():
    cfg = dict(BASE, grad_accum_steps=2, steps_per_call=2)
    mesh, state, step = _build(cfg)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P(None, "data"))
    im = jax.device_put(
        rng.integers(0, 255, (2, 16, 16, 16, 3), dtype=np.uint8), sh)
    lb = jax.device_put(rng.integers(0, 1, (2, 16), dtype=np.int32), sh)
    state, m = step(state, im, lb)
    assert np.isfinite(float(m["G_loss"]))
    assert int(jax.device_get(state.step)) == 2


def test_trainer_grad_accum_end_to_end(tmp_path):
    data = make_synthetic_dataset(str(tmp_path / "ds"), num=32, img_size=16,
                                  num_classes=4, seed=1)
    cfg = resolve_config({
        "dataset": "synthetic", "data_path": data, "model": "vanilla",
        "z_dim": 8, "gf_dim": 8, "df_dim": 8, "lr_g": 2e-4, "lr_d": 7e-4,
        "decay_rate": 0.99, "use_attention": True, "attn_dim_G": [8],
        "attn_dim_D": [8], "use_label": False, "batch_size": 4,
        "loss": "hinge_loss", "epoch": 1, "update_ratio": 1,
        "num_sample": 4, "summary_step_freq": 100, "data_size": -1,
        "compute_dtype": "float32", "seed": 0, "num_devices": 8,
        "grad_accum_steps": 2,
    }, num_local_devices=8)
    tr = Trainer(cfg)
    tr.train(num_epochs=1)
    assert tr.global_step() == tr.steps_per_epoch
    assert np.isfinite(tr.sample_images()).all()
