"""Model-parallel (GSPMD) training-path tests on the 8-virtual-device CPU
mesh: 2-D (data, model) meshes, column-sharded kernels, XLA-placed
tensor-parallel collectives.

The reference is data-parallel only (tf.distribute.MirroredStrategy,
/root/reference/sagan/main.py:91-98); the model axis is a TPU-native
extension for pod-scale configs (SURVEY.md §2.2 "optional for 128²
BigGAN-scale config").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.data.synthetic import make_synthetic_dataset
from sagan_tpu.models import get_discriminator, get_generator
from sagan_tpu.parallel.mesh import (make_mesh, model_parallel_size,
                                     param_shardings, shard_batch)
from sagan_tpu.train.optim import make_gan_optimizers
from sagan_tpu.train.trainer import Trainer, TrainState, build_train_step
from sagan_tpu.utils.config import resolve_config

CONFIG = {
    "model": "resnet",
    "z_dim": 16,
    "gf_dim": 16,
    "df_dim": 16,
    "img_size": 16,
    "use_attention": True,
    "attn_dim_G": [8],
    "attn_dim_D": [8],
    "use_label": True,
    "use_cond_bn": True,
    "num_classes": 4,
    "compute_dtype": "float32",
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "update_ratio": 1,
    "loss": "hinge_loss",
    "use_pallas": False,
    "global_batch_size": 16,
}


def _build(model_parallel, overrides=None):
    config = dict(CONFIG, **(overrides or {}))
    mesh = make_mesh(8, model_parallel=model_parallel)
    gen = get_generator(config)
    disc = get_discriminator(config)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(config, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)
    vars_g = gen.init(key)
    vars_d = disc.init(jax.random.fold_in(key, 1))
    state = TrainState(
        vars_g=vars_g, vars_d=vars_d,
        opt_g=opt_g.init(vars_g["params"]),
        opt_d=opt_d.init(vars_d["params"]),
        step=jnp.int32(0), rng=jax.random.fold_in(key, 2))
    shs = param_shardings(mesh, state)
    state = jax.device_put(state, shs)
    step = build_train_step(gen, disc, opt_g, opt_d, config, mesh,
                            state_shardings=shs)
    return mesh, state, step


def _run(model_parallel, steps=2, overrides=None):
    mesh, state, step = _build(model_parallel, overrides)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(steps):
        images = rng.integers(0, 255, (16, 16, 16, 3), dtype=np.uint8)
        labels = rng.integers(0, 4, (16,), dtype=np.int32)
        im, lb = shard_batch(mesh, images, labels)
        state, metrics = step(state, im, lb)
        losses.append((float(metrics["G_loss"]), float(metrics["D_loss"])))
    return state, losses


def test_gspmd_shards_wide_kernels_and_trains():
    state, losses = _run(2)
    for g, d in losses:
        assert np.isfinite(g) and np.isfinite(d)
    assert int(jax.device_get(state.step)) == 2
    # wide kernels are column-sharded over the model axis; vectors and
    # scalars stay replicated
    stem_w = state.vars_g["params"]["stem"]["w"]
    assert "model" in str(stem_w.sharding.spec)
    sharded = [x for x in jax.tree.leaves(state.vars_g["params"])
               if "model" in str(x.sharding.spec)]
    assert len(sharded) >= 3
    sigma = state.vars_d["params"]  # biases/BN/scalars replicated
    for leaf in jax.tree.leaves(sigma):
        if leaf.ndim < 2:
            assert "model" not in str(leaf.sharding.spec)


def test_gspmd_mesh_shapes_agree():
    """(4 data x 2 model) and (2 data x 4 model) run the same global
    math; losses match to float-reassociation tolerance."""
    _, l2 = _run(2)
    _, l4 = _run(4)
    for (g2, d2), (g4, d4) in zip(l2, l4):
        assert np.allclose([g2, d2], [g4, d4], atol=2e-2), (l2, l4)
    # step 0 has no compounded drift: tight agreement
    assert np.allclose(l2[0], l4[0], atol=2e-3), (l2[0], l4[0])


def test_gspmd_optimizer_state_sharding_matches_params():
    _, state, _ = _build(2)
    mu = state.opt_g[0].mu if hasattr(state.opt_g[0], "mu") else None
    if mu is None:  # optax chain structure: find the Adam state
        for s in jax.tree_util.tree_leaves(
                state.opt_g, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(s, "mu"):
                mu = s.mu
                break
    assert mu is not None
    specs_p = jax.tree.map(lambda x: str(x.sharding.spec),
                           state.vars_g["params"])
    specs_m = jax.tree.map(lambda x: str(x.sharding.spec), mu)
    assert specs_p == specs_m


def test_model_parallel_config_validation():
    base = dict(data_path="x", batch_size=2, z_dim=8, gf_dim=8, df_dim=8,
                lr_g=1e-4, lr_d=4e-4)
    with pytest.raises(ValueError, match="model_parallel"):
        resolve_config(dict(base, num_devices=8, model_parallel=3),
                       num_local_devices=8)
    cfg = resolve_config(dict(base, num_devices=8, model_parallel=2),
                         num_local_devices=8)
    # global batch = per-device batch x data width (model axis replicates)
    assert cfg["global_batch_size"] == 2 * 4


def test_gspmd_steps_per_call_scan():
    """lax.scan-fused multi-step training works under the GSPMD path."""
    cfg = dict(CONFIG, steps_per_call=2)
    mesh = make_mesh(8, model_parallel=2)
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
    shs = param_shardings(mesh, state)
    state = jax.device_put(state, shs)
    step = build_train_step(gen, disc, opt_g, opt_d, cfg, mesh,
                            state_shardings=shs)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 16, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (2, 16), dtype=np.int32)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "data"))
    state, metrics = step(state, jax.device_put(images, sh),
                          jax.device_put(labels, sh))
    assert np.isfinite(float(metrics["G_loss"]))
    assert int(jax.device_get(state.step)) == 2


def test_gspmd_checkpoint_round_trip(tmp_path):
    """Orbax saves/restores the model-sharded state (sharded jax.Arrays
    round-trip through StandardSave/StandardRestore)."""
    from sagan_tpu.train.checkpoint import CheckpointManager

    mesh, state, step = _build(2)
    rng = np.random.default_rng(0)
    im, lb = shard_batch(
        mesh, rng.integers(0, 255, (16, 16, 16, 3), dtype=np.uint8),
        rng.integers(0, 4, (16,), dtype=np.int32))
    state, _ = step(state, im, lb)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.wait()
    restored = mgr.restore_latest(state)
    mgr.close()
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 1
    np.testing.assert_array_equal(
        np.asarray(restored.vars_g["params"]["stem"]["w"]),
        np.asarray(state.vars_g["params"]["stem"]["w"]))
    # restored with the template's sharding preserved
    assert "model" in str(restored.vars_g["params"]["stem"]["w"]
                          .sharding.spec)


def test_trainer_model_parallel_end_to_end(tmp_path):
    data = make_synthetic_dataset(str(tmp_path / "ds"), num=32, img_size=16,
                                  num_classes=4, seed=1)
    cfg = resolve_config({
        "dataset": "synthetic", "data_path": data, "model": "vanilla",
        "z_dim": 8, "gf_dim": 8, "df_dim": 8, "lr_g": 2e-4, "lr_d": 7e-4,
        "decay_rate": 0.99, "use_attention": True, "attn_dim_G": [8],
        "attn_dim_D": [8], "use_label": False, "batch_size": 2,
        "loss": "hinge_loss", "epoch": 1, "update_ratio": 1,
        "num_sample": 4, "summary_step_freq": 4, "data_size": -1,
        "compute_dtype": "float32", "seed": 0, "num_devices": 8,
        "model_parallel": 2,
    }, num_local_devices=8)
    tr = Trainer(cfg)
    assert model_parallel_size(tr.mesh) == 2
    assert tr.mesh.shape["data"] == 4
    assert cfg["global_batch_size"] == 8
    tr.train(num_epochs=1)
    assert tr.global_step() == tr.steps_per_epoch
    imgs = tr.sample_images()
    assert imgs.shape == (4, 16, 16, 3)
    assert np.isfinite(imgs).all()


def test_gspmd_grad_accum_with_ema():
    """Gradient accumulation + EMA under the GSPMD (model-parallel)
    path: the global batch splits into micro-batches inside the
    annotated-jit program, the EMA copy shards by the same shape-based
    rule as the params and moves after the step."""
    cfg = dict(CONFIG, grad_accum_steps=2, g_ema_decay=0.9)
    mesh = make_mesh(8, model_parallel=2)
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
        step=jnp.int32(0), rng=jax.random.fold_in(key, 2),
        ema_g=jax.tree.map(jnp.copy, vars_g["params"]))
    shs = param_shardings(mesh, state)
    state = jax.device_put(state, shs)
    step = build_train_step(gen, disc, opt_g, opt_d, cfg, mesh,
                            state_shardings=shs)
    rng = np.random.default_rng(0)
    im, lb = shard_batch(
        mesh, rng.integers(0, 255, (16, 16, 16, 3), dtype=np.uint8),
        rng.integers(0, 4, (16,), dtype=np.int32))
    state, metrics = step(state, im, lb)
    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))
    assert int(jax.device_get(state.step)) == 1
    # EMA moved toward the updated params and kept its model sharding
    w = state.vars_g["params"]["stem"]["w"]
    e = state.ema_g["stem"]["w"]
    assert not np.array_equal(np.asarray(e), np.asarray(w))
    assert "model" in str(e.sharding.spec)


# ---------------------------------------------------------------------------
# Pallas kernels under GSPMD (round 3): batch-dim custom_partitioning
# ---------------------------------------------------------------------------


def _sharded_qkv(mesh, b=8, n=64, m=16, d=4, c=8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P("data"))
    q = jax.device_put(rng.standard_normal((b, n, d)).astype(np.float32), sh)
    k = jax.device_put(rng.standard_normal((b, m, d)).astype(np.float32), sh)
    v = jax.device_put(rng.standard_normal((b, m, c)).astype(np.float32), sh)
    return q, k, v


def test_attention_partitioned_engages_custom_call_no_gather():
    """The batch-partitioned fused attention lowers to a
    CustomSPMDPartitioning call and partitions WITHOUT gathering the
    batch (the round-2 behavior was a silent downgrade to einsum)."""
    from sagan_tpu.ops.attention import attention_reference
    from sagan_tpu.ops.pallas_attention import attention_fused_partitioned

    mesh = make_mesh(8, model_parallel=2)
    q, k, v = _sharded_qkv(mesh)

    fn = jax.jit(lambda q, k, v: attention_fused_partitioned(
        q, k, v, interpret=True))
    txt = fn.lower(q, k, v).as_text()
    assert "CustomSPMDPartitioning" in txt
    compiled = fn.lower(q, k, v).compile().as_text()
    assert "all-gather" not in compiled
    out = fn(q, k, v)
    assert "data" in str(out.sharding.spec)
    ref = attention_reference(np.asarray(q), np.asarray(k), np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_attention_partitioned_grads_match_reference():
    from sagan_tpu.ops.attention import attention_reference
    from sagan_tpu.ops.pallas_attention import attention_fused_partitioned

    mesh = make_mesh(8, model_parallel=2)
    q, k, v = _sharded_qkv(mesh)

    def loss_p(q, k, v):
        return jnp.sum(attention_fused_partitioned(
            q, k, v, interpret=True) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(np.asarray(q), np.asarray(k),
                                             np.asarray(v))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_gspmd_train_step_pallas_parity():
    """The full mp=2 train step with the partitioned Pallas kernels
    (use_pallas=True, interpret on CPU) matches the XLA-attention step
    to float tolerance — same RNG, same data (VERDICT r2 #4 'done'
    criterion)."""
    _, l_xla = _run(2)
    _, l_pl = _run(2, overrides={"use_pallas": True,
                                 "pallas_partitioned": True})
    assert np.allclose(l_pl[0], l_xla[0], atol=2e-3), (l_pl, l_xla)
    for (gp, dp), (gx, dx) in zip(l_pl, l_xla):
        assert np.allclose([gp, dp], [gx, dx], atol=2e-2), (l_pl, l_xla)
