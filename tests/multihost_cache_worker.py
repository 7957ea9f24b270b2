"""Worker process for the 2-process device-cache parity test
(test_multihost.py::test_two_process_device_cache_matches_host_feed).

Each worker (4 virtual CPU devices, one ``jax.distributed`` service)
drives one full epoch twice from identical initial state:

1. host feed — ``ds.epoch(0)`` batches shard_batch'd over the global
   mesh (the path the existing multihost test proves);
2. device-cache feed — ``build_device_cache`` uploads the host's LOCAL
   loader shard with the per-host leading device axis, then the
   ``indexed=True, cache_per_host=True`` train step gathers in-program
   from ``ds.epoch_index_batches(0)`` index batches.

The two parameter checksums must agree bit-for-bit on every host (the
index schedule reproduces the cached host feed exactly), and across
hosts (pmean).  The dataset deliberately has uneven per-host shards so
the padded-to-allgathered-max upload and the lockstep index wraparound
are both exercised.

Run:  python multihost_cache_worker.py <process_id> <num_processes> \
          <port> <data>
Prints one line  CACHEPARITY_OK pid=i host=<checksum> cache=<checksum>
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
                                         put_with_sharding, replicate,
                                         shard_batch)

    initialize_distributed(coordinator=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from sagan_tpu.data.loader import get_dataset_and_info
    from sagan_tpu.models import get_discriminator, get_generator
    from sagan_tpu.train.optim import make_gan_optimizers
    from sagan_tpu.train.trainer import (TrainState, build_device_cache,
                                         build_train_step)
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
    ds, config = get_dataset_and_info(config)
    mesh = make_mesh(config["num_devices"])
    gen = get_generator(config)
    disc = get_discriminator(config)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(config, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)
    vars_g = gen.init(key)
    vars_d = disc.init(jax.random.fold_in(key, 1))

    def fresh_state():
        return replicate(mesh, TrainState(
            vars_g=vars_g, vars_d=vars_d,
            opt_g=opt_g.init(vars_g["params"]),
            opt_d=opt_d.init(vars_d["params"]),
            step=jnp.int32(0), rng=jax.random.fold_in(key, 2)))

    def checksum(state):
        local = jax.tree.map(
            lambda a: np.asarray(a.addressable_data(0), np.float64),
            state.vars_g["params"])
        return sum(float(np.sum(x)) for x in jax.tree.leaves(local))

    # 1. host feed (the proven path)
    step = build_train_step(gen, disc, opt_g, opt_d, config, mesh)
    state = fresh_state()
    for images, labels in ds.epoch(0):
        state, _ = step(state, *shard_batch(mesh, images, labels))
    host_sum = checksum(state)

    # 2. device-cache feed: per-host shard upload + in-program gather
    data, idx_sharding, per_host = build_device_cache(ds, mesh)
    assert per_host, "expected the multi-process per-host cache layout"
    step_idx = build_train_step(gen, disc, opt_g, opt_d, config, mesh,
                                indexed=True, cache_per_host=True)
    state = fresh_state()
    count = 0
    for idx in ds.epoch_index_batches(0):
        state, _ = step_idx(state, *data,
                            put_with_sharding(idx, idx_sharding))
        count += 1
    assert count == ds.steps_per_epoch, (count, ds.steps_per_epoch)
    cache_sum = checksum(state)

    assert np.isfinite(host_sum) and np.isfinite(cache_sum)

    # 3. Trainer-level auto path: the lazy _maybe_build_device_cache
    #    must engage the multi-process cache (padded-shard budget
    #    allgather included) and train an epoch end-to-end.
    from sagan_tpu.train.trainer import Trainer

    tcfg = dict(config)
    tcfg.update({"epoch": 1, "print_variables": False,
                 "device_cache": "auto"})
    tr = Trainer(tcfg)
    tr.train(num_epochs=1)
    assert tr._device_data is not None, "auto device cache did not engage"
    assert tr.global_step() > 0

    print(f"CACHEPARITY_OK pid={pid} host={host_sum:.10f} "
          f"cache={cache_sum:.10f}", flush=True)


if __name__ == "__main__":
    main()
