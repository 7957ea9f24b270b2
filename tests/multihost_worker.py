"""Worker process for the 2-process jax.distributed integration test
(test_multihost.py).  Each worker owns 4 virtual CPU devices; together
they form one 8-device global mesh over the coordination service — the
DCN analog of the reference's multi-GPU MirroredStrategy bring-up
(/root/reference/sagan/main.py:91-98).

Run:  python multihost_worker.py <process_id> <num_processes> <port> <data>
Prints one line  MULTIHOST_OK pid=i loss=<G_loss> checksum=<params-sum>
that the parent compares across workers (pmean ⇒ identical).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    data_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sagan_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         replicate, shard_batch)

    initialize_distributed(coordinator=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from sagan_tpu.data.loader import get_dataset_and_info
    from sagan_tpu.models import get_discriminator, get_generator
    from sagan_tpu.train.optim import make_gan_optimizers
    from sagan_tpu.train.trainer import TrainState, build_train_step
    from sagan_tpu.utils.config import resolve_config

    config = resolve_config({
        "data_path": data_path,
        "model": "vanilla",
        "z_dim": 8, "gf_dim": 8, "df_dim": 8,
        "lr_g": 2e-4, "lr_d": 7e-4, "decay_rate": 0.99,
        "use_attention": True, "attn_dim_G": [8], "attn_dim_D": [8],
        "use_label": True, "use_cond_bn": True,
        "batch_size": 2, "loss": "hinge_loss",
        "compute_dtype": "float32",
        "process_count": nproc, "process_index": pid,
    })
    # the mesh width must default to the GLOBAL device count
    assert config["num_devices"] == 4 * nproc, config["num_devices"]
    assert config["global_batch_size"] == 2 * 4 * nproc

    ds, config = get_dataset_and_info(config)
    assert ds.batch_size == config["global_batch_size"] // nproc

    mesh = make_mesh(config["num_devices"])
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
    state = replicate(mesh, state)
    step = build_train_step(gen, disc, opt_g, opt_d, config, mesh)

    # Drive a FULL epoch, not one batch: with uneven shard files the
    # hosts' local record counts differ, and only the lockstep contract
    # (every host yields exactly steps_per_epoch batches) keeps the
    # cross-host pmean collectives aligned — a mismatch would hang here
    # and fail the parent's timeout.
    count = 0
    metrics = None
    for images, labels in ds.epoch(0):
        images, labels = shard_batch(mesh, images, labels)
        assert images.shape[0] == config["global_batch_size"]  # global view
        state, metrics = step(state, images, labels)
        count += 1
    assert count == ds.steps_per_epoch, (count, ds.steps_per_epoch)
    jax.block_until_ready(metrics)
    loss = float(jax.device_get(metrics["G_loss"]))
    # fully-addressable checksum of the (replicated, pmean-synced) params
    local = jax.tree.map(
        lambda a: np.asarray(a.addressable_data(0), np.float64),
        state.vars_g["params"])
    checksum = float(sum(float(np.sum(x)) for x in jax.tree.leaves(local)))
    assert np.isfinite(loss) and np.isfinite(checksum)
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f} "
          f"checksum={checksum:.6f} steps={count}", flush=True)


if __name__ == "__main__":
    main()
