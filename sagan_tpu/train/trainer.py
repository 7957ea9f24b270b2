"""GAN trainer: shard_map data-parallel TTUR training over an ICI mesh.

The TPU-native replacement for the reference's Trainer
(/root/reference/sagan/main.py:88-341).  Key differences by design:

* one jitted, donated ``train_step`` compiled under ``shard_map`` over a
  1-D ``data`` mesh — the MirroredStrategy replica loop, the implicit
  NCCL all-reduce at ``apply_gradients``, and the explicit
  ``strategy.reduce`` metric sums (sagan/main.py:213-236) all collapse
  into ``lax.pmean`` collectives that XLA schedules onto ICI;
* state (G/D variables, both optimizer states, step, PRNG key) is one
  explicit pytree, donated every step — no host↔device traffic besides
  the uint8 batch and scalar metrics;
* D's inner update loop (``update_ratio``× per G step,
  sagan/main.py:175-192) is unrolled statically inside the same XLA
  program, G forward for fakes runs without gradient exactly like the
  reference's outside-the-tape call (:178);
* batches arrive uint8 and are normalized to [-1,1] on device
  (sagan/dataset.py:33 semantics, but after the transfer, not before);
* per-replica RNG: the step key is folded with ``axis_index('data')`` so
  replicas draw independent noise/fake-labels — then gradients pmean.

Checkpointing is Orbax (G and D state together, step-indexed, keep-10 —
the analog of the twin CheckpointManagers at sagan/main.py:149-152);
summaries go through our TensorBoard-format writer; sample grids are PNG.
"""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import PartitionSpec as P

from ..data.loader import get_dataset_and_info
from ..models import get_discriminator, get_generator
from ..ops.losses import get_loss
from ..parallel.mesh import (DATA_AXIS, make_mesh, model_parallel_size,
                             param_shardings, put_with_sharding, replicate,
                             shard_batch)
from ..utils.images import save_image_grid
from ..utils.tb_writer import SummaryWriter
from .optim import make_gan_optimizers


class TrainState(NamedTuple):
    vars_g: Any
    vars_d: Any
    opt_g: Any
    opt_d: Any
    step: jax.Array     # int32 global step counter
    rng: jax.Array      # master PRNG key (folded with step per iteration)
    ema_g: Any = None   # EMA of G params (None when g_ema_decay == 0)


class _MetricsPacker:
    """Pack a metrics pytree into ONE flat f32 device vector so the
    summary fetch is a single tunnel round trip.

    ``jax.device_get`` on a ~30-leaf metrics dict costs 30-50 ms on this
    remote backend (one round trip per leaf, measured); fetching one
    packed vector costs ~1.5 ms.  The pack itself is an extra jitted
    program, but it is dispatched asynchronously and only at summary
    cadence (a few times per epoch), not per step."""

    def __init__(self, template):
        leaves, self.treedef = jax.tree.flatten(template)
        self.shapes = [tuple(leaf.shape) for leaf in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self._pack = jax.jit(lambda t: jnp.concatenate(
            [jnp.ravel(x).astype(jnp.float32)
             for x in jax.tree.leaves(t)]))

    def pack(self, tree):
        return self._pack(tree)

    def unpack(self, flat) -> dict:
        flat = np.asarray(flat)
        out, off = [], 0
        for shape, size in zip(self.shapes, self.sizes):
            out.append(flat[off:off + size].reshape(shape))
            off += size
        return jax.tree.unflatten(self.treedef, out)


def build_train_step(gen, disc, opt_g, opt_d, config, mesh,
                     state_shardings=None, indexed=False,
                     cache_per_host=False):
    """Returns jitted (state, images_u8, labels) -> (state, metrics).

    With ``indexed=True`` (device-resident dataset cache) the signature
    is (state, data_imgs_u8, data_labels, idx) -> (state, metrics): the
    batch gather from the HBM-resident dataset happens inside the step's
    own XLA program (see the ``indexed`` branch below).
    ``cache_per_host=True`` (multi-process runs) marks the dataset
    arrays as carrying a leading device axis sharded over ``data`` —
    each shard is a copy of the owning host's LOCAL dataset shard (see
    ``build_device_cache``); the step drops the unit axis before
    gathering.

    ``config['steps_per_call'] = K > 1`` fuses K consecutive training
    steps into one XLA program via ``lax.scan`` (batches arrive stacked
    as [K, B, ...]); per-call dispatch over the tunneled device costs
    ~1.5 ms (fetch-forced measurement), so K=8 removes ~16% of the
    church64 step time and more for smaller models.  Numerics are
    identical to K sequential calls: the per-step RNG is folded from the
    step counter, which the scan increments exactly as the host loop
    would.  Per-call metrics are the mean over the K steps.

    Two parallelism modes, chosen by the mesh:

    * 1-D ``(data,)`` mesh — explicit SPMD: the step runs under
      ``shard_map``; gradients/BN moments are ``lax.pmean``-combined and
      per-replica RNG is folded from ``axis_index`` (the proven DP path,
      the analog of the reference's MirroredStrategy).
    * 2-D ``(data, model)`` mesh — GSPMD: the same step function traced
      over *global* arrays under ``jax.jit`` with sharding annotations
      (``state_shardings`` from ``parallel.mesh.param_shardings``: wide
      kernels column-sharded over ``model``, batch over ``data``); XLA
      inserts every collective (grad all-reduces over ``data``,
      tensor-parallel gathers over ``model``).  Cross-replica BN and the
      global-batch loss scaling are automatic here: the traced batch IS
      the global batch.
    """
    z_dim = config["z_dim"]
    num_classes = max(1, config.get("num_classes", 1))
    update_ratio = config.get("update_ratio", 1)
    gloss_fn, dloss_fn = get_loss(config.get("loss", "hinge_loss"))
    ema_decay = config.get("g_ema_decay", 0.0)
    # Delayed EMA start (BigGAN practice): before step g_ema_start the
    # EMA tracks the raw params exactly (decay 0 = copy), so early
    # random-init weights never enter the average.  Measured need:
    # artifacts/church64_ema_refresh — at only 2208 steps, decay-0.999
    # EMA-from-init evaluates WORSE than the raw G (proxy-FID 5.51 vs
    # 3.49) because the average is still dominated by early weights.
    ema_start = int(config.get("g_ema_start", 0))
    fuse_d = config.get("fuse_d_batches", True)
    summary_var = config.get("summary_var", True)
    random_flip = config.get("random_flip", False)
    accum = config.get("grad_accum_steps", 1)
    # Exact accumulated-BN semantics (default on): micro-batch moments
    # are averaged and running-stat momentum applied ONCE per optimizer
    # step, matching the unaccumulated step's statistics exactly.
    # ``exact_accum_bn: False`` restores the per-micro momentum updates
    # (the pre-round-4 behavior, documented in PARITY.md).
    bn_acc = accum > 1 and config.get("exact_accum_bn", True)
    if bn_acc:
        from ..nn.layers import (bn_accum_begin, bn_accum_finalize,
                                 bn_moment_paths)
        gen_bn = bn_moment_paths(gen)
        disc_bn = bn_moment_paths(disc)
    # (the SN backend — XLA vs fused Pallas — is per-model config, set
    # by the model factories via nn.layers.set_sn_backend)
    gspmd = model_parallel_size(mesh) > 1
    axis = None if gspmd else DATA_AXIS

    def sample_latents(key, batch):
        kz, kl = jax.random.split(key)
        z = jax.random.normal(kz, (batch, z_dim), jnp.float32)
        fake_labels = jax.random.randint(kl, (batch,), 0, num_classes)
        return z, fake_labels

    def step_fn(state: TrainState, images_u8, labels):
        batch = images_u8.shape[0]  # per-replica batch
        # device-side normalization to [-1, 1] (sagan/dataset.py:33)
        images = images_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0

        step_key = jax.random.fold_in(state.rng, state.step)
        # per-replica RNG under shard_map; under GSPMD the step traces
        # over the global batch, so one stream covers all devices
        replica_key = (step_key if axis is None else
                       jax.random.fold_in(step_key, lax.axis_index(axis)))
        # Disjoint per-purpose streams: folding raw integers off one key
        # risks collisions (a flip fold of 7 would coincide with the
        # D-iteration-7 latents at update_ratio >= 8), so split instead.
        flip_key, d_key, g_key = jax.random.split(replica_key, 3)

        if random_flip:
            # on-device per-sample horizontal flip (the TPU-side analog
            # of the reference's ImageDataGenerator horizontal_flip,
            # sagan/dataset.py:72 — available to the TFRecord path here)
            flip = jax.random.bernoulli(flip_key, 0.5, (batch, 1, 1, 1))
            images = jnp.where(flip, images[:, :, ::-1, :], images)

        vars_g, vars_d = state.vars_g, state.vars_d
        opt_g_state, opt_d_state = state.opt_g, state.opt_d

        if batch % accum:
            raise ValueError(
                f"grad_accum_steps={accum} must divide the "
                f"{'global' if axis is None else 'per-replica'} "
                f"batch {batch}")
        micro = batch // accum
        if accum > 1:
            # gradient accumulation: the (per-replica) batch splits into
            # `accum` micro-batches; grads are averaged over them before
            # one optimizer update, so the *effective* batch matches the
            # config while activation memory scales with batch/accum —
            # how the pod-scale batch-2048 configs run on small slices.
            # (BN normalizes per micro-batch, but running statistics
            # are exact — accumulated moments, momentum applied once —
            # unless exact_accum_bn=False; documented in PARITY.md.)
            images_m = images.reshape(accum, micro, *images.shape[1:])
            labels_m = labels.reshape(accum, micro)

        is_hinge = config.get("loss", "hinge_loss") == "hinge_loss"

        def d_health(out_real, out_fake):
            """Adversarial-balance diagnostics (round-3 addition after
            the gf64 artifact trained 22/30 epochs at D_loss=0 —
            VERDICT r2): mean D scores and the fraction of examples
            still contributing gradient.  Loss-aware: under hinge_loss
            that is the hinge margin (real < 1 / fake > -1,
            ops/losses.py); under cross_entropy (BCE-from-logits) an
            example's gradient magnitude is |sigmoid(logit) - target|,
            so we count examples where it exceeds 1e-2 (|logit| below
            ~4.6).  Fractions near 0 mean the discriminator has
            saturated and the adversarial signal is degenerate."""
            r = out_real.astype(jnp.float32)
            f = out_fake.astype(jnp.float32)
            if is_hinge:
                in_r, in_f = r < 1.0, f > -1.0
            else:
                in_r = jax.nn.sigmoid(r) < 1.0 - 1e-2
                in_f = jax.nn.sigmoid(f) > 1e-2
            return {
                "D_real_mean": jnp.mean(r),
                "D_fake_mean": jnp.mean(f),
                "D_real_in_margin": jnp.mean(in_r.astype(jnp.float32)),
                "D_fake_in_margin": jnp.mean(in_f.astype(jnp.float32)),
            }

        def d_loss(params_d, aux_d, imgs, lbls, fake, fl):
            b = imgs.shape[0]
            vd = {"params": params_d, "aux": aux_d}
            if fuse_d:
                # Real and fake batches share one D forward
                # (concatenated on the batch axis): identical math —
                # both D families have no batch-coupled layers — and
                # half the kernel dispatches of the reference's two
                # separate calls (sagan/main.py:181-182), the hottest
                # region of the step (SURVEY.md §3.2). +25% step
                # throughput measured on v5e.
                both = jnp.concatenate([imgs.astype(fake.dtype), fake], 0)
                both_labels = jnp.concatenate([lbls, fl], 0)
                out, aux2 = disc(vd, both, both_labels, train=True,
                                 axis=axis, bn_accum=bn_acc)
                out_real, out_fake = out[:b], out[b:]
            else:
                out_real, aux1 = disc(vd, imgs, lbls, train=True,
                                      axis=axis, bn_accum=bn_acc)
                vd = {"params": params_d, "aux": aux1}
                out_fake, aux2 = disc(vd, fake, fl, train=True, axis=axis,
                                      bn_accum=bn_acc)
            return (dloss_fn(out_real, out_fake),
                    (aux2, d_health(out_real, out_fake)))

        # ---- D updates (update_ratio x, sagan/main.py:175-192) ----------
        d_loss_acc = jnp.float32(0.0)
        health_acc = {k: jnp.float32(0.0) for k in
                      ("D_real_mean", "D_fake_mean",
                       "D_real_in_margin", "D_fake_in_margin")}
        for i in range(update_ratio):
            iter_key = jax.random.fold_in(d_key, i)
            if accum == 1:
                z, fl = sample_latents(iter_key, batch)
                fake, aux_g = gen(vars_g, z, fl, train=True, axis=axis)
                fake = lax.stop_gradient(fake)
                vars_g = {"params": vars_g["params"], "aux": aux_g}
                (loss_d, (aux_d, health)), grads_d = jax.value_and_grad(
                    d_loss, has_aux=True)(vars_d["params"], vars_d["aux"],
                                          images, labels, fake, fl)
            else:
                def d_micro(carry, xs):
                    aux_g_c, aux_d_c, loss_c, grads_c, health_c = carry
                    imgs_a, lbls_a, z, fl = xs
                    fake, aux_g2 = gen(
                        {"params": vars_g["params"], "aux": aux_g_c},
                        z, fl, train=True, axis=axis, bn_accum=bn_acc)
                    fake = lax.stop_gradient(fake)
                    (loss, (aux_d2, health2)), g = jax.value_and_grad(
                        d_loss, has_aux=True)(vars_d["params"], aux_d_c,
                                              imgs_a, lbls_a, fake, fl)
                    carry = (aux_g2, aux_d2, loss_c + loss,
                             jax.tree.map(jnp.add, grads_c, g),
                             jax.tree.map(jnp.add, health_c, health2))
                    return carry, None

                # latents for the WHOLE effective batch from the same
                # key as the unaccumulated path, chunked per micro-batch
                # — the RNG stream is bit-identical to accum=1
                z_all, fl_all = sample_latents(iter_key, batch)
                z_m = z_all.reshape(accum, micro, z_dim)
                fl_m = fl_all.reshape(accum, micro)
                aux_g0, aux_d0 = vars_g["aux"], vars_d["aux"]
                if bn_acc:
                    aux_g0, g_saved = bn_accum_begin(gen_bn, aux_g0)
                    aux_d0, d_saved = bn_accum_begin(disc_bn, aux_d0)
                zeros = jax.tree.map(jnp.zeros_like, vars_d["params"])
                zeros_h = jax.tree.map(jnp.zeros_like, health_acc)
                (aux_g, aux_d, loss_sum, grads_sum, health_sum), _ = \
                    lax.scan(
                        d_micro,
                        (aux_g0, aux_d0, jnp.float32(0.0),
                         zeros, zeros_h),
                        (images_m, labels_m, z_m, fl_m))
                if bn_acc:
                    aux_g = bn_accum_finalize(gen_bn, aux_g, g_saved, accum)
                    aux_d = bn_accum_finalize(disc_bn, aux_d, d_saved, accum)
                vars_g = {"params": vars_g["params"], "aux": aux_g}
                loss_d = loss_sum / accum
                grads_d = jax.tree.map(lambda g: g / accum, grads_sum)
                health = jax.tree.map(lambda h: h / accum, health_sum)
            if axis is not None:
                grads_d = lax.pmean(grads_d, axis)
                loss_d = lax.pmean(loss_d, axis)
                health = lax.pmean(health, axis)
            updates, opt_d_state = opt_d.update(grads_d, opt_d_state,
                                                vars_d["params"])
            vars_d = {"params": optax.apply_updates(vars_d["params"],
                                                    updates),
                      "aux": aux_d}
            d_loss_acc = d_loss_acc + loss_d
            health_acc = jax.tree.map(jnp.add, health_acc, health)
        d_grad_norm = optax.global_norm(grads_d)

        # ---- G update (sagan/main.py:194-205) ---------------------------
        if accum == 1:
            z, fl = sample_latents(g_key, batch)

            def g_loss(params_g, aux_g):
                vg = {"params": params_g, "aux": aux_g}
                fake, aux_g2 = gen(vg, z, fl, train=True, axis=axis)
                out_fake, aux_d2 = disc(vars_d, fake, fl, train=True,
                                        axis=axis)
                return gloss_fn(out_fake), (aux_g2, aux_d2)

            (loss_g, (aux_g2, aux_d2)), grads_g = jax.value_and_grad(
                g_loss, has_aux=True)(vars_g["params"], vars_g["aux"])
        else:
            def g_micro(carry, xs):
                aux_g_c, aux_d_c, loss_c, grads_c = carry
                z, fl = xs

                def g_loss(params_g, aux_g):
                    vg = {"params": params_g, "aux": aux_g}
                    fake, aux_g2 = gen(vg, z, fl, train=True, axis=axis,
                                       bn_accum=bn_acc)
                    out_fake, aux_d2 = disc(
                        {"params": vars_d["params"], "aux": aux_d_c},
                        fake, fl, train=True, axis=axis, bn_accum=bn_acc)
                    return gloss_fn(out_fake), (aux_g2, aux_d2)

                (loss, (aux_g2, aux_d2)), g = jax.value_and_grad(
                    g_loss, has_aux=True)(vars_g["params"], aux_g_c)
                carry = (aux_g2, aux_d2, loss_c + loss,
                         jax.tree.map(jnp.add, grads_c, g))
                return carry, None

            # full-batch latents from the same key as accum=1 (see the
            # D branch above)
            z_all, fl_all = sample_latents(g_key, batch)
            z_m = z_all.reshape(accum, micro, z_dim)
            fl_m = fl_all.reshape(accum, micro)
            aux_g0, aux_d0 = vars_g["aux"], vars_d["aux"]
            if bn_acc:
                aux_g0, g_saved = bn_accum_begin(gen_bn, aux_g0)
                aux_d0, d_saved = bn_accum_begin(disc_bn, aux_d0)
            zeros = jax.tree.map(jnp.zeros_like, vars_g["params"])
            (aux_g2, aux_d2, loss_sum, grads_sum), _ = lax.scan(
                g_micro,
                (aux_g0, aux_d0, jnp.float32(0.0), zeros),
                (z_m, fl_m))
            if bn_acc:
                aux_g2 = bn_accum_finalize(gen_bn, aux_g2, g_saved, accum)
                aux_d2 = bn_accum_finalize(disc_bn, aux_d2, d_saved, accum)
            loss_g = loss_sum / accum
            grads_g = jax.tree.map(lambda g: g / accum, grads_sum)
        if axis is not None:
            grads_g = lax.pmean(grads_g, axis)
            loss_g = lax.pmean(loss_g, axis)
        updates, opt_g_state = opt_g.update(grads_g, opt_g_state,
                                            vars_g["params"])
        vars_g = {"params": optax.apply_updates(vars_g["params"], updates),
                  "aux": aux_g2}
        vars_d = {"params": vars_d["params"], "aux": aux_d2}

        ema_g = state.ema_g
        if ema_g is not None:
            decay_t = jnp.where(state.step >= ema_start, ema_decay, 0.0)
            ema_g = jax.tree.map(
                lambda e, p: decay_t * e + (1.0 - decay_t) * p,
                ema_g, vars_g["params"])

        metrics = {
            "G_loss": loss_g,
            "D_loss": d_loss_acc / update_ratio,
            "G_grad_norm": optax.global_norm(grads_g),
            "D_grad_norm": d_grad_norm,
        }
        # D-health diagnostics, averaged over the update_ratio D
        # iterations (see d_health above)
        metrics.update({k: v / update_ratio for k, v in health_acc.items()})
        if summary_var:
            # per-variable means + gradient norms ride along in the
            # step's own XLA program (a separate jit dispatch costs
            # ~30 ms over a tunneled device) — the reference's
            # per-G-variable Mean metrics and grads_norm/{name} scalars
            # (sagan/main.py:154-165, 277-278)
            metrics["G_var_means"] = jnp.stack(
                [jnp.mean(x) for x in jax.tree.leaves(vars_g["params"])])
            metrics["G_grad_norms"] = jnp.stack(
                [jnp.linalg.norm(g) for g in jax.tree.leaves(grads_g)])
        new_state = TrainState(vars_g, vars_d, opt_g_state, opt_d_state,
                               state.step + 1, state.rng, ema_g)
        return new_state, metrics

    steps_per_call = config.get("steps_per_call", 1)
    if indexed:
        # Device-cache mode: the step gathers its batch from the
        # HBM-resident dataset INSIDE its own XLA program —
        # (state, data_imgs, data_labels, idx) — instead of a separate
        # gather jit feeding (images, labels).  Removes one program
        # boundary per call from the hot loop (each costs ms-scale gaps
        # on the tunneled backend) and lets XLA fuse the gather with the
        # uint8→[-1,1] normalize.  ``jnp.take(..., axis=0)`` with the
        # same indices is bit-identical to the standalone ``d[i]``
        # gather, so the host-feed parity contract is unchanged.
        # cache_per_host: inside shard_map the data block arrives
        # [1, n_pad, ...] (its host's local shard copy) — drop the axis
        unwrap = (lambda d: d[0]) if cache_per_host else (lambda d: d)
        if steps_per_call > 1:
            def fn(state, data_imgs, data_labels, idx_k):  # idx [K, B]
                imgs_all = unwrap(data_imgs)
                labels_all = unwrap(data_labels)

                def body(st, idx):
                    return step_fn(st,
                                   jnp.take(imgs_all, idx, axis=0),
                                   jnp.take(labels_all, idx, axis=0))

                state, metrics_k = lax.scan(body, state, idx_k)
                metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                       metrics_k)
                return state, metrics

            idx_spec = P(None, DATA_AXIS)
        else:
            def fn(state, data_imgs, data_labels, idx):
                return step_fn(state,
                               jnp.take(unwrap(data_imgs), idx, axis=0),
                               jnp.take(unwrap(data_labels), idx, axis=0))

            idx_spec = P(DATA_AXIS)

        if gspmd:
            if cache_per_host:
                raise ValueError("cache_per_host (multi-process device "
                                 "cache) requires the 1-D data-parallel "
                                 "mesh, not GSPMD")
            from jax.sharding import NamedSharding
            kwargs = {}
            if state_shardings is not None:
                rep = NamedSharding(mesh, P())
                kwargs = dict(
                    in_shardings=(state_shardings, rep, rep,
                                  NamedSharding(mesh, idx_spec)),
                    out_shardings=(state_shardings, rep))
            return jax.jit(fn, donate_argnums=(0,), **kwargs)
        data_spec = P(DATA_AXIS) if cache_per_host else P()
        sharded = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), data_spec, data_spec, idx_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    if steps_per_call > 1:
        def multi_fn(state, images_k, labels_k):  # [K, B_local, ...]
            def body(st, xs):
                return step_fn(st, xs[0], xs[1])

            state, metrics_k = lax.scan(body, state, (images_k, labels_k))
            # per-call metrics = mean over the K scanned steps (the
            # in-program analog of the reference's tf.keras.metrics.Mean
            # accumulators, sagan/main.py:155-165)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_k)
            return state, metrics

        fn, batch_spec = multi_fn, P(None, DATA_AXIS)
    else:
        fn, batch_spec = step_fn, P(DATA_AXIS)

    if gspmd:
        # GSPMD: trace over global arrays; annotate in/out shardings and
        # let XLA place the data-parallel reductions and the
        # tensor-parallel (model-axis) gathers.  Pinning out_shardings to
        # the input state shardings keeps the donated state's layout
        # fixed across steps (no reshard/recompile ping-pong).
        from jax.sharding import NamedSharding
        batch_sh = NamedSharding(mesh, batch_spec)
        kwargs = {}
        if state_shardings is not None:
            kwargs = dict(
                in_shardings=(state_shardings, batch_sh, batch_sh),
                out_shardings=(state_shardings, NamedSharding(mesh, P())))
        return jax.jit(fn, donate_argnums=(0,), **kwargs)

    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def build_device_cache(ds, mesh, steps_per_call: int = 1):
    """Upload the host-local dataset shard to HBM for the indexed feed.

    Returns ``((imgs_dev, labels_dev), idx_sharding, per_host)`` for use
    with ``build_train_step(indexed=True, cache_per_host=per_host)``.

    Single-process: the uint8 arrays are replicated over the mesh and
    each device gathers its batch rows from its own copy.

    Multi-process (DCN): each host holds a DIFFERENT loader shard, which
    a replicated global array cannot express — instead the data gets a
    leading device axis sharded over ``data``, every shard being a copy
    of the owning host's local data (per-device HBM cost identical to
    the single-process replication).  Local shard lengths may differ
    across hosts (uneven shard files, SURVEY.md §5 lockstep contract);
    all hosts zero-pad to the allgathered max — pad rows are never
    gathered because ``epoch_index_batches`` only draws indices below
    the local record count.
    """
    from jax.sharding import NamedSharding

    imgs, labels = ds.materialized()
    per_host = jax.process_count() > 1
    if not per_host:
        rep = NamedSharding(mesh, P())
        data = (jax.device_put(imgs, rep), jax.device_put(labels, rep))
    else:
        if model_parallel_size(mesh) > 1:
            raise ValueError("device_cache: multi-process + model_parallel"
                             " is not supported (use the host feed)")
        from jax.experimental import multihost_utils

        n_local = len(labels)
        counts = np.asarray(multihost_utils.process_allgather(
            np.asarray(n_local, np.int32)))
        n_pad = int(counts.max())
        if n_pad != n_local:
            imgs = np.concatenate(
                [imgs, np.zeros((n_pad - n_local,) + imgs.shape[1:],
                                imgs.dtype)])
            labels = np.concatenate(
                [labels, np.zeros((n_pad - n_local,), labels.dtype)])
        local_devs = [d for d in mesh.devices.flat
                      if d.process_index == jax.process_index()]
        img_sh = NamedSharding(mesh, P(DATA_AXIS, *([None] * imgs.ndim)))
        lab_sh = NamedSharding(mesh, P(DATA_AXIS, None))

        def upload(a, sh):
            # one [1, ...] shard device_put per local device — NOT a
            # broadcast_to + ascontiguousarray host buffer, which would
            # materialize local_device_count contiguous copies of the
            # padded shard in host RAM before the transfer
            shards = [jax.device_put(a[None], d) for d in local_devs]
            return jax.make_array_from_single_device_arrays(
                (mesh.devices.size,) + a.shape, sh, shards)

        data = (upload(imgs, img_sh), upload(labels, lab_sh))
    idx_spec = P(None, DATA_AXIS) if steps_per_call > 1 else P(DATA_AXIS)
    return data, NamedSharding(mesh, idx_spec), per_host


def build_sample_fn(gen, mesh):
    """Jitted eval-mode generation from fixed latents (summary grids)."""

    def sample(vars_g, z, labels):
        imgs, _ = gen(vars_g, z, labels, train=False)
        return imgs.astype(jnp.float32)

    return jax.jit(sample)


class Trainer:
    """Config-driven trainer (same config dict contract as
    /root/reference/sagan/main.py — see utils/config.py)."""

    def __init__(self, config: dict):
        self.ds_train, self.config = get_dataset_and_info(config)
        config = self.config

        num_devices = config.get("num_devices") or len(jax.devices())
        mp = config.get("model_parallel", 1)
        self.mesh = make_mesh(num_devices, model_parallel=mp)
        if mp > 1:
            # GSPMD path: the fused attention kernels stay enabled via
            # their batch-dim custom_partitioning rules
            # (ops/pallas_attention.py, round 3) — the step no longer
            # silently downgrades to the HBM-materialized einsum path.
            config.setdefault("pallas_partitioned", True)
            # SN keeps the XLA backend: the power iteration runs on the
            # weight matrix itself, which under tensor parallelism is
            # the model-sharded array — a single-shard Pallas kernel
            # would force an all-gather of every sharded kernel each
            # step, whereas XLA's einsum SN keeps the weight sharded
            # and inserts only a scalar-sized psum.
            if config.get("use_pallas_sn"):
                print("model_parallel > 1: SN stays on the XLA backend "
                      "(the weight operand is model-sharded; a fused "
                      "single-shard kernel would gather it)", flush=True)
            config.pop("use_pallas_sn", None)
        n = self.mesh.shape[DATA_AXIS]
        if config["global_batch_size"] % n:
            raise ValueError(
                f"global_batch_size {config['global_batch_size']} not "
                f"divisible by the {n}-wide data axis")

        self.steps_per_call = max(1, config.get("steps_per_call", 1))
        self.steps_per_epoch = (self.ds_train.steps_per_epoch //
                                self.steps_per_call) * self.steps_per_call
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"no full training call per epoch: dataset provides "
                f"{self.ds_train.steps_per_epoch} steps/epoch "
                f"(batch {self.ds_train.batch_size}) but "
                f"steps_per_call={self.steps_per_call}; lower "
                f"steps_per_call/batch_size or add data")
        print("total steps:", self.steps_per_epoch * config["epoch"])

        self.generator = get_generator(config)
        self.discriminator = get_discriminator(config)

        (self.opt_g, self.sched_g), (self.opt_d, self.sched_d) = \
            make_gan_optimizers(config, self.steps_per_epoch)

        key = jax.random.PRNGKey(config.get("seed", 0))
        kg, kd, kz, kl, krest = jax.random.split(key, 5)
        vars_g = self.generator.init(kg)
        vars_d = self.discriminator.init(kd)
        ema_decay = config.get("g_ema_decay", 0.0)
        state = TrainState(
            vars_g=vars_g,
            vars_d=vars_d,
            opt_g=self.opt_g.init(vars_g["params"]),
            opt_d=self.opt_d.init(vars_d["params"]),
            step=jnp.int32(0),
            rng=krest,
            ema_g=(jax.tree.map(jnp.copy, vars_g["params"])
                   if ema_decay > 0 else None),
        )
        self.state_shardings = (param_shardings(self.mesh, state)
                                if mp > 1 else None)
        self.state = (jax.device_put(state, self.state_shardings)
                      if mp > 1 else replicate(self.mesh, state))
        if config.get("print_variables", True):
            self._print_variable_names()

        # fixed eval latents (sagan/main.py:167-168)
        num_sample = config.get("num_sample", 16)
        self.fixed_z = jax.random.normal(kz, (num_sample, config["z_dim"]))
        self.fixed_labels = jax.random.randint(
            kl, (num_sample,), 0, max(1, config.get("num_classes", 1)))

        self.train_step = build_train_step(
            self.generator, self.discriminator, self.opt_g, self.opt_d,
            config, self.mesh, state_shardings=self.state_shardings)
        self.sample_fn = build_sample_fn(self.generator, self.mesh)

        self.writer = None
        if config.get("log_dir"):
            self.writer = SummaryWriter(config["log_dir"])

        self.ckpt_mgr = None
        if config.get("ckpt_dir"):
            from .checkpoint import CheckpointManager
            self.ckpt_mgr = CheckpointManager(config["ckpt_dir"],
                                              max_to_keep=10)
            restored = self.ckpt_mgr.restore_latest(self.state)
            if restored is not None:
                self.state = (jax.device_put(restored, self.state_shardings)
                              if self.state_shardings is not None
                              else replicate(self.mesh, restored))
                print(f"Restored from checkpoint at step "
                      f"{int(self.state.step)}")
            else:
                print("Initializing from scratch.")

        self._profile_dir = config.get("profile_dir")
        self._device_data = None
        self.train_step_indexed = None
        self._device_cache_checked = False
        self._packer = None  # lazy _MetricsPacker (built on first fetch)
        # the cache itself is built lazily on the first train() call —
        # eval-only users (evaluate.py CLI) must not pay a full dataset
        # decode + HBM upload for a sample_fn they could build alone

    # -- device-resident dataset cache --------------------------------------
    def _maybe_build_device_cache(self) -> None:
        """Upload the whole (uint8) dataset to HBM once and feed the
        train loop INDEX arrays instead of image bytes.

        Motivation (round 3): with the one-transfer-ahead host feed the
        church64 training loop sustained only ~2-3k imgs/s against a
        measured 8.7k imgs/s device rate — the remote-tunnel host→HBM
        link (~12 MB per fused call) is the bottleneck, not the loader
        (tools/bench_loader.py: 30-200k imgs/s host-side).  GAN datasets
        at these resolutions are small by HBM standards (church64
        TFRecords: 148 MB; LSUN church @64px: ~1.5 GB), so the
        TPU-native fix is to keep the dataset device-resident and send
        ~2 KB of indices per call.  The index schedule reproduces the
        cached host path EXACTLY (ImageDataset.epoch_index_batches), so
        resume and numerics are unchanged.

        ``device_cache``: True / False / "auto" (default) — auto enables
        when the dataset exposes the index protocol, the in-RAM dataset
        cache is on (the index schedule reproduces the *cached* host
        feed; with ``cache_dataset: False`` the host feed uses the
        streaming-buffer shuffle, a different schedule, so auto
        respects the opt-out), and the uploaded shard fits
        ``device_cache_budget_mb`` (default 2048).  Multi-process runs
        cache each host's shard padded to the allgathered max (see
        ``build_device_cache``), and the budget is checked against that
        actual padded size; unsupported only in combination with
        ``model_parallel``.
        """
        if self._device_cache_checked:
            return
        self._device_cache_checked = True
        config = self.config
        mode = config.get("device_cache", "auto")
        if not mode:
            return
        ds = self.ds_train
        if not hasattr(ds, "epoch_index_batches"):
            if mode is True:
                raise ValueError(
                    "device_cache=True needs the TFRecord dataset path "
                    "(the augmenting image-folder loader re-draws images "
                    "every epoch and cannot be frozen into a cache)")
            return
        if not getattr(ds, "cache_in_memory", False):
            if mode is True:
                raise ValueError(
                    "device_cache=True conflicts with cache_dataset="
                    "False: the index schedule reproduces the CACHED "
                    "host feed (Fisher-Yates per epoch); the uncached "
                    "host feed uses the streaming-buffer shuffle, a "
                    "different schedule, so enabling both would break "
                    "exact resume against it")
            return
        # gate on jax.process_count(), NOT config["process_count"]:
        # build_device_cache() keys the per-host layout off the former,
        # and a config that doesn't thread the count through (distributed
        # init is a public standalone call) must not skip the padded-max
        # budget check or the model_parallel rejection below
        nproc = jax.process_count()
        if nproc > 1 and model_parallel_size(self.mesh) > 1:
            if mode is True:
                raise ValueError("device_cache with model_parallel is "
                                 "single-process only (use the host feed "
                                 "for multi-host GSPMD runs)")
            return
        budget = config.get("device_cache_budget_mb", 2048) * (1 << 20)
        # Budget against the size each device will ACTUALLY hold: the
        # materialized local shard, padded to the allgathered max —
        # file-based sharding gives uneven shards, so a global/nproc
        # estimate can undercount the biggest host's upload.  (The
        # materialization is not wasted on the reject path: with
        # cache_in_memory on, the host feed serves from the same cache.)
        n_upload = len(ds.materialized()[1])
        if nproc > 1:
            from jax.experimental import multihost_utils
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray(n_upload, np.int32)))
            n_upload = int(counts.max())  # consistent across hosts
        est = n_upload * ds.img_size * ds.img_size * 3
        if est > budget:
            if mode is True:
                raise ValueError(
                    f"device_cache=True but the (padded) local shard is "
                    f"~{est >> 20} MB"
                    f" > device_cache_budget_mb={budget >> 20}")
            return

        self._device_data, self._idx_sharding, per_host = \
            build_device_cache(ds, self.mesh, self.steps_per_call)
        # the batch gather runs INSIDE the train step's XLA program
        # (build_train_step indexed=True) — a separate gather jit would
        # add one program boundary per call to the hot loop
        self.train_step_indexed = build_train_step(
            self.generator, self.discriminator, self.opt_g, self.opt_d,
            self.config, self.mesh, state_shardings=self.state_shardings,
            indexed=True, cache_per_host=per_host)
        imgs, labels = ds.materialized()
        print(f"device cache: {imgs.nbytes >> 20} MB "
              f"{'(local shard) ' if per_host else ''}uploaded to HBM "
              f"({len(labels)} records); feeding index batches",
              flush=True)

    def _device_batches_from_cache(self, epoch: int, skip_calls: int = 0):
        """Index-feed analog of _device_batches: same one-transfer-ahead
        pattern, but the per-call host→device traffic is an int32 index
        array instead of the image bytes.  Yields device index arrays;
        the train loop passes them (with the HBM-resident data) to
        ``train_step_indexed``, which gathers in-program."""
        K = self.steps_per_call

        def source():
            if K <= 1:
                yield from self.ds_train.epoch_index_batches(epoch)
                return
            pack = []
            for idx in self.ds_train.epoch_index_batches(epoch):
                pack.append(idx)
                if len(pack) == K:
                    yield np.stack(pack)
                    pack = []

        pending = None
        for idx in source():
            if skip_calls > 0:  # mid-epoch resume: host-side skip only
                skip_calls -= 1
                continue
            ready = pending
            pending = put_with_sharding(idx, self._idx_sharding)
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending

    # -- helpers -----------------------------------------------------------
    def global_step(self) -> int:
        return int(jax.device_get(self.state.step))

    @staticmethod
    def _tree_paths(tree) -> list:
        from ..utils.trees import tree_paths
        return tree_paths(tree)

    def _var_paths(self) -> list:
        return self._tree_paths(self.state.vars_g["params"])

    def _print_variable_names(self) -> None:
        """Startup dump of every trainable variable path — the
        reference pprints all trainable variable names after build
        (sagan/main.py:143-146)."""
        for tag, tree in (("G", self.state.vars_g["params"]),
                          ("D", self.state.vars_d["params"])):
            paths = self._tree_paths(tree)
            print(f"{tag} trainable variables ({len(paths)}):")
            for p in paths:
                print(f"  {tag}/{p}")

    def var_summaries(self, means) -> dict:
        """Mean of every generator variable, keyed by its tree path —
        the reference's per-variable TensorBoard scalars
        (sagan/main.py:154-165, 322-330).  ``means`` is the stacked
        ``G_var_means`` vector the train step emits alongside the losses
        (computed in-step: an extra jit dispatch costs ~30 ms over a
        tunneled device)."""
        means = np.asarray(means)
        return {f"vars/G/{name}": float(m)
                for name, m in zip(self._var_paths(), means)}

    def grad_norm_summaries(self, norms) -> dict:
        """Per-variable G gradient norms, keyed by tree path — the
        reference's ``grads_norm/{name}`` scalars (sagan/main.py:159,
        277-278).  ``norms`` is the stacked ``G_grad_norms`` vector the
        train step emits (computed in-step, same rationale as
        ``G_var_means``)."""
        norms = np.asarray(norms)
        return {f"grads_norm/G/{name}": float(v)
                for name, v in zip(self._var_paths(), norms)}

    def eval_vars_g(self):
        """G variables for evaluation: EMA params when tracked (standard
        GAN eval practice; extension over the reference), else the live
        training params."""
        state = self.state
        if state.ema_g is not None:
            return {"params": state.ema_g, "aux": state.vars_g["aux"]}
        return state.vars_g

    def sample_images_device(self):
        """Dispatch the fixed-latent G forward and return the device
        array WITHOUT fetching — the in-loop summary path defers the
        host copy so the ~0.8 MB tunnel transfer and PNG/TB encode
        overlap device execution instead of draining the pipeline
        (measured 11% of end-to-end throughput,
        tools/bench_epoch_overhead.py)."""
        return self.sample_fn(self.eval_vars_g(), self.fixed_z,
                              self.fixed_labels)

    def sample_images(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.sample_images_device()))

    def _start_host_copies(self, rec) -> None:
        """Best-effort ``copy_to_host_async`` on a deferred-summary
        record's device values so the transfer overlaps the next
        summary interval's compute.  Harmless if the backend ignores
        it — the ``device_get`` at consume time then pays the transfer,
        still overlapped with the device's dispatch backlog."""
        if not getattr(self, "_host_copy_async", True):
            return
        try:
            for leaf in jax.tree.leaves(rec[2]):
                leaf.copy_to_host_async()
            if rec[3] is not None:
                rec[3].copy_to_host_async()
        except (AttributeError, NotImplementedError, TypeError):
            # the array type/backend has no async copy: stop trying
            self._host_copy_async = False
        except Exception:
            # transient failure on this record only — the device_get at
            # consume time still fetches it; keep async copies armed
            pass

    def _epoch_of(self, step: int) -> int:
        return step // max(1, self.steps_per_epoch)

    def _device_batches(self, epoch: int, skip_calls: int = 0):
        """Iterate device-resident sharded batches one transfer ahead:
        batch N+1's host→HBM copy is enqueued while step N computes
        (device_put is async), hiding transfer latency behind the step.

        With ``steps_per_call = K > 1``, K host batches are stacked into
        one [K, B, ...] transfer per train-step call (remainder steps at
        the epoch tail are dropped, drop_remainder-style).

        When the device-resident dataset cache is active the images are
        already in HBM and only index arrays cross the link
        (_device_batches_from_cache)."""
        if self._device_data is not None:
            yield from self._device_batches_from_cache(epoch, skip_calls)
            return
        K = self.steps_per_call
        if K <= 1:
            source = self.ds_train.epoch(epoch)
        else:
            from ..parallel.mesh import (put_with_sharding,
                                         stacked_batch_sharding)
            sharding = stacked_batch_sharding(self.mesh)

            def packed():
                imgs_k, labels_k = [], []
                for images, labels in self.ds_train.epoch(epoch):
                    imgs_k.append(images)
                    labels_k.append(labels)
                    if len(imgs_k) == K:
                        yield np.stack(imgs_k), np.stack(labels_k)
                        imgs_k, labels_k = [], []

            source = packed()

        pending = None
        for host_batch in source:
            if skip_calls > 0:  # mid-epoch resume: host-side skip only
                skip_calls -= 1
                continue
            ready = pending
            if K <= 1:
                pending = shard_batch(self.mesh, *host_batch)
            else:
                pending = tuple(put_with_sharding(a, sharding)
                                for a in host_batch)
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending

    def _install_preemption_handler(self):
        """Save-and-exit on SIGTERM/SIGINT — preemption-safe training,
        a failure-handling subsystem the reference lacks entirely
        (SURVEY.md §5 'Failure detection: none')."""
        import signal

        self._preempted = False

        previous = {}

        def handler(signum, _frame):
            print(f"received signal {signum}: will checkpoint and stop "
                  f"after the current step (signal again to force-quit)",
                  flush=True)
            self._preempted = True
            # restore prior handlers so a second signal is not swallowed
            # (e.g. Ctrl-C during a 40-300s TPU compile)
            self._restore_handlers(previous)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except ValueError:  # not the main thread
                pass
        return previous

    # -- main loop (sagan/main.py:238-297) ---------------------------------
    def train(self, num_epochs: int | None = None):
        num_epochs = num_epochs or self.config["epoch"]
        start_epoch = self._epoch_of(self.global_step())
        if start_epoch >= num_epochs:
            print(f"training already complete "
                  f"(step {self.global_step()}, epoch {start_epoch}/"
                  f"{num_epochs})", flush=True)
            return

        self._maybe_build_device_cache()
        previous_handlers = self._install_preemption_handler()
        try:
            self._train_epochs(start_epoch, num_epochs)
        finally:
            self._restore_handlers(previous_handlers)

    def _train_epochs(self, start_epoch, num_epochs):
        from ..utils.profiling import StepTimer, TraceWindow

        config = self.config
        tracer = (TraceWindow(self._profile_dir, start=10, stop=20)
                  if self._profile_dir else None)
        # summary_step_freq is in steps; the loop iterates per call
        summary_freq = max(1, config.get("summary_step_freq", 100)
                           // self.steps_per_call)
        img_dir = config.get("img_dir")
        fid_freq = config.get("fid_epoch_freq", 0)
        # Mid-epoch resume (preemption checkpoint): skip the calls this
        # epoch already consumed.  The loader's shuffle is seeded by
        # (data_seed, epoch), so replaying the host stream reproduces the
        # exact remaining-batch schedule.
        resume_skip = ((self.global_step() % self.steps_per_epoch)
                       // self.steps_per_call
                       if self.steps_per_epoch else 0)
        if resume_skip:
            print(f"resuming mid-epoch: skipping {resume_skip} consumed "
                  f"calls of epoch {start_epoch}", flush=True)
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            count = 0
            acc: dict[str, float] = {}
            acc_n = 0
            acc_last = -1   # call index of the newest accumulated fetch
            timer = StepTimer()
            timer_last = 0  # call index of the newest timed fetch
            skip = resume_skip if epoch == start_epoch else 0
            cached = self._device_data is not None
            # Deferred summaries: a summary point enqueues async host
            # copies of (metrics, sample grid) and consumes the PREVIOUS
            # interval's copies — the fetch then waits only for a step
            # the device has long finished, and the TB/PNG encode
            # overlaps device execution of the backlog instead of
            # draining the pipeline.  Measured on hardware
            # (tools/bench_epoch_overhead.py): the synchronous form
            # cost 21% of end-to-end church64 throughput (grid 11%,
            # scalar fetch+encode 10%).
            pending_summary = None

            def consume(rec):
                nonlocal acc_n, acc_last, timer_last
                rec_count, rec_step, rec_packed, rec_sample = rec
                fetched = self._packer.unpack(jax.device_get(rec_packed))
                # the fetch above is a true barrier for step rec_count
                # (block_until_ready does not wait on this backend)
                timer.tick(rec_count - timer_last)
                timer_last = rec_count
                var_means = fetched.pop("G_var_means", None)
                fetched.pop("G_grad_norms", None)
                m = {k: float(v) for k, v in fetched.items()}
                for k, v in m.items():
                    acc[k] = acc.get(k, 0.0) + v
                acc_n += 1
                acc_last = rec_count
                if self.writer:
                    self.writer.scalars(
                        {f"step/{k}": v for k, v in m.items()}, rec_step)
                    if var_means is not None:
                        self.writer.scalars(
                            self.var_summaries(var_means), rec_step)
                    # fixed-latent sample grid every summary_step_freq
                    # steps (sagan/main.py:266-268, 332-339)
                    from ..utils.images import make_grid
                    self.writer.image(
                        "sample",
                        make_grid(np.asarray(jax.device_get(rec_sample))),
                        rec_step)
                    self.writer.flush()
            # Host-side step counter: ``global_step()`` fetches
            # state.step of the NEWEST dispatched call, so calling it
            # mid-loop is a full pipeline drain (measured ~50 ms device
            # idle per summary point, tools/bench_epoch_overhead.py).
            # The counter is deterministic (+steps_per_call per call);
            # it is synced from the device once per epoch, at a point
            # where the pipeline is already drained.
            host_step = self.global_step()
            for batch in self._device_batches(epoch, skip):
                if tracer and epoch == start_epoch:
                    # trace steps [10, 20) of the first epoch (post-warmup)
                    tracer.step(count)
                if cached:   # batch is a device index array
                    self.state, metrics = self.train_step_indexed(
                        self.state, *self._device_data, batch)
                else:
                    images, labels = batch
                    self.state, metrics = self.train_step(self.state, images,
                                                          labels)
                count += 1
                host_step += self.steps_per_call
                if tracer and epoch == start_epoch:
                    # keep the trace barrier pointing at the NEWEST
                    # dispatched call: draining through it pins the
                    # trace window to executed steps, not dispatch
                    # indices (device_get is the only true barrier here)
                    tracer.barrier = (
                        lambda m=metrics: jax.device_get(m["G_loss"]))
                if self._preempted:
                    if pending_summary is not None:
                        # already packed and copying — write it so the
                        # interval survives the preemption/resume cycle
                        consume(pending_summary)
                        pending_summary = None
                    if tracer:
                        tracer.close()
                    if self.ckpt_mgr:
                        self.ckpt_mgr.save(self.global_step(), self.state)
                        self.ckpt_mgr.wait()
                        print(f"preempted at step {self.global_step()}: "
                              f"checkpoint saved, exiting", flush=True)
                    else:
                        print(f"preempted at step {self.global_step()}: "
                              f"no ckpt_dir configured, exiting without "
                              f"saving", flush=True)
                    return
                if count % summary_freq == 0:
                    if self._packer is None:
                        self._packer = _MetricsPacker(metrics)
                    rec = (count, host_step,
                           self._packer.pack(metrics),
                           self.sample_images_device()
                           if self.writer else None)
                    self._start_host_copies(rec)
                    if pending_summary is not None:
                        consume(pending_summary)
                    pending_summary = rec

            if tracer:
                tracer.close()
            if count == 0:
                raise RuntimeError(
                    "epoch produced no batches — data_size/global_batch "
                    "too small for even one step")

            if pending_summary is not None:
                # drain the deferred summary from the last interval
                consume(pending_summary)
                pending_summary = None
            step = self.global_step()
            if self._packer is None:
                self._packer = _MetricsPacker(metrics)
            fetched = self._packer.unpack(
                jax.device_get(self._packer.pack(metrics)))
            # epoch_time is taken AFTER the fetch above so it is strictly
            # fetch-forced — it includes the drain of every dispatched
            # step (block_until_ready is not a barrier on this backend)
            epoch_time = time.time() - t0
            timer.tick(count - timer_last)
            fetched.pop("G_var_means", None)
            grad_norms = fetched.pop("G_grad_norms", None)
            m = {k: float(v) for k, v in fetched.items()}
            if acc_last != count:
                # final-step fetch — but only if the in-loop summary
                # cadence didn't already accumulate this very call
                # (summary_freq dividing the call count would otherwise
                # double-count the last step in every epoch)
                for k, v in m.items():
                    acc[k] = acc.get(k, 0.0) + v
                acc_n += 1
            # Epoch scalars are the mean of the sampled per-summary-step
            # fetches (the reference accumulates tf.keras.metrics.Mean
            # over every step, sagan/main.py:274-278 — we sample every
            # summary_step_freq to avoid per-step device syncs; see
            # PARITY.md)
            mean = {k: v / acc_n for k, v in acc.items()}
            # End-to-end ms/step from the fetch-forced epoch wall clock
            # (includes loader + overlapped summary work — the honest
            # sustained rate).  The timer's fetch-to-fetch estimate is
            # kept as a separate scalar: with deferred summaries its
            # barriers are one interval stale, so it is a best-effort
            # execution-time view, not the throughput number.
            step_ms = 1000.0 * epoch_time / count / self.steps_per_call
            exec_ms = timer.mean_ms()
            exec_ms = exec_ms / self.steps_per_call if exec_ms else None
            if self.writer:
                scalars = {
                    "generator_loss": mean["G_loss"],
                    "discriminator_loss": mean["D_loss"],
                    "G_grad_norm": mean["G_grad_norm"],
                    "D_grad_norm": mean["D_grad_norm"],
                    "epoch_time_sec": epoch_time,
                    "step_time_ms": step_ms,
                    **({"step_time_exec_ms": exec_ms}
                       if exec_ms is not None else {}),
                    "lr_g": float(self.sched_g(step)),
                    "lr_d": float(self.sched_d(step * config.get(
                        "update_ratio", 1))),
                }
                if grad_norms is not None:
                    # per-epoch grads_norm/{var} (sagan/main.py:277-278)
                    scalars.update(self.grad_norm_summaries(grad_norms))
                self.writer.scalars(scalars, epoch)
                if config.get("summary_histograms"):
                    # per-variable weight distributions (observability
                    # extension beyond the reference; opt-in)
                    for tag, tree in (("G", self.state.vars_g["params"]),
                                      ("D", self.state.vars_d["params"])):
                        host = jax.device_get(tree)
                        self.writer.histograms(
                            {f"hist/{tag}/{p}": np.ravel(a)
                             for p, a in zip(self._tree_paths(host),
                                             jax.tree.leaves(host))},
                            epoch)
                self.writer.flush()
            imgs_per_sec = (count * self.steps_per_call *
                            config["global_batch_size"] / epoch_time)
            health_str = ""
            if "D_real_mean" in mean:
                # adversarial-balance diagnostics: margin fractions near
                # 0.00 flag a saturated D (VERDICT r2 gf64 finding)
                health_str = (
                    f" D(real)={mean['D_real_mean']:+.2f}"
                    f" D(fake)={mean['D_fake_mean']:+.2f}"
                    f" in_margin={mean['D_real_in_margin']:.2f}/"
                    f"{mean['D_fake_in_margin']:.2f}")
            print(f"epoch {epoch}: G_loss={mean['G_loss']:.4f} "
                  f"D_loss={mean['D_loss']:.4f}{health_str} "
                  f"time={epoch_time:.1f}s "
                  f"({imgs_per_sec:.1f} imgs/s, "
                  f"{step_ms:.2f} ms/step)",
                  flush=True)

            # checkpoint at epoch 5 then every 10 (sagan/main.py:284-287)
            if self.ckpt_mgr and (epoch == 5 or (epoch and epoch % 10 == 0)
                                  or epoch == num_epochs - 1):
                self.ckpt_mgr.save(step, self.state)

            # sample grids: first 5 epochs then every 5 (sagan/main.py:289)
            if img_dir and (epoch < 5 or epoch % 5 == 0
                            or epoch == num_epochs - 1):
                grid = self.sample_images()
                save_image_grid(grid, os.path.join(
                    img_dir, f"epoch_{epoch:04d}.png"))
                if self.writer:
                    from ..utils.images import make_grid
                    self.writer.image("sample", make_grid(grid), step)
                    self.writer.flush()

            if fid_freq and (epoch + 1) % fid_freq == 0:
                from .fid import compute_fid_for_trainer, get_extractor
                # Name the metric by the backend ACTUALLY used: with the
                # random-feature proxy the tag is "proxy_FID" — its
                # absolute scale is NOT comparable to published FID, and
                # an unlabeled "FID=0.17" invites exactly that misread
                # (VERDICT r3 item 7).
                extractor = get_extractor(config)
                fid_tag = ("FID" if extractor.backend == "inception"
                           else "proxy_FID")
                fid = compute_fid_for_trainer(self, extractor=extractor)
                print(f"epoch {epoch}: {fid_tag} = {fid:.2f}", flush=True)
                if self.writer:
                    self.writer.scalar(fid_tag, fid, step)
                    self.writer.flush()
                if config.get("inception_score"):
                    # IS rides the FID cadence (the paper's metric pair)
                    from .iscore import (get_classifier,
                                         inception_score_for_trainer)
                    classifier = get_classifier(config)
                    is_tag = ("IS" if classifier.backend == "inception"
                              else "proxy_IS")
                    is_mean, is_std = inception_score_for_trainer(
                        self, classifier=classifier)
                    print(f"epoch {epoch}: {is_tag} = {is_mean:.2f} "
                          f"± {is_std:.2f}", flush=True)
                    if self.writer:
                        self.writer.scalar(is_tag, is_mean, step)
                        self.writer.flush()

        if self.ckpt_mgr:
            self.ckpt_mgr.wait()

    @staticmethod
    def _restore_handlers(previous: dict) -> None:
        import signal

        for sig, h in previous.items():
            signal.signal(sig, h)


def main(config: dict):
    trainer = Trainer(config)
    trainer.train()
    return trainer
