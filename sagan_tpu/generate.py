"""Offline sampling / serving CLI: checkpoint → images.

The reference has no inference entry point at all — generation happens
only as a side effect of training (fixed-latent grids,
/root/reference/sagan/main.py:289-291,300-320).  This CLI completes the
deployment story: load the latest checkpoint for a config (EMA generator
when the run tracked one), sample in jitted batches on the accelerator,
and write PNG grids and/or an npz of uint8 images.

    python -m sagan_tpu.generate --config_path example_configs/foo.py \
        [--num 64] [--batch 64] [--seed 0] [--truncation 0.5] \
        [--class_id 207] [--out samples/foo] [--format png|npz|both] \
        [--step N] [--export g.npz | --weights g.npz]

``--export g.npz`` writes the evaluation generator (EMA when tracked)
as one flat numpy archive — the deployment format: serving needs only
the config + that file, no Orbax checkpoint tree (``--weights g.npz``
samples from it).  ``--step`` pins a specific checkpointed step.

``--truncation t`` applies the BigGAN truncation trick (z drawn from a
standard normal truncated to [-t, t]; smaller t → higher fidelity, lower
diversity).  ``--class_id`` pins the class for conditional models
(default: random classes, the training-time sampler's behavior).
"""

from __future__ import annotations

import argparse
import os

from .utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from .models import get_discriminator, get_generator
from .train.optim import make_gan_optimizers
from .train.trainer import TrainState, build_sample_fn
from .utils.config import load_config_file, resolve_config
from .utils.images import save_image_grid


def restore_eval_state(config: dict, step: int | None = None):
    """Checkpoint → (generator, eval variables {params, aux}).

    Rebuilds the exact TrainState template the Trainer checkpoints
    (G+D variables, both optimizer states, step, RNG, optional EMA) so
    Orbax can restore structurally, then selects the EMA parameters for
    evaluation when the run tracked them.  ``step`` pins a specific
    checkpointed step (default: the newest readable one).
    """
    from .train.checkpoint import CheckpointManager

    ckpt_dir = config.get("ckpt_dir")
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(
            f"no checkpoint directory at {ckpt_dir!r} — train first "
            f"(python -m sagan_tpu.main --config_path ...)")

    gen = get_generator(config)
    disc = get_discriminator(config)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(config, steps_per_epoch=1)
    key = jax.random.PRNGKey(config.get("seed", 0))
    kg, kd, _kz, _kl, krest = jax.random.split(key, 5)
    vars_g = gen.init(kg)
    vars_d = disc.init(kd)
    template = TrainState(
        vars_g=vars_g, vars_d=vars_d,
        opt_g=opt_g.init(vars_g["params"]),
        opt_d=opt_d.init(vars_d["params"]),
        step=jnp.int32(0), rng=krest,
        ema_g=(jax.tree.map(jnp.copy, vars_g["params"])
               if config.get("g_ema_decay", 0.0) > 0 else None))
    mgr = CheckpointManager(ckpt_dir)
    try:
        state = (mgr.restore_step(step, template) if step is not None
                 else mgr.restore_latest(template))
    finally:
        mgr.close()
    if state is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    print(f"restored step {int(jax.device_get(state.step))} from {ckpt_dir}"
          + (" (EMA generator)" if state.ema_g is not None else ""))
    eval_vars = ({"params": state.ema_g, "aux": state.vars_g["aux"]}
                 if state.ema_g is not None else state.vars_g)
    return gen, eval_vars


# -- standalone weight export / import (serving without Orbax) -------------


from .utils.trees import flatten_with_paths as _flat_with_paths


def export_generator_npz(gen, eval_vars, out_path: str,
                         config: dict | None = None) -> str:
    """Write the evaluation generator's variables to one ``.npz``.

    Deployment format: flat ``{params,aux}/<tree/path>`` arrays — no
    Orbax, no optimizer state, no discriminator; loadable anywhere with
    numpy + this module (``load_generator_npz``).  When ``config`` is
    given, the model geometry (``meta/img_size`` etc.) is embedded so
    the serving box needs neither the dataset nor its
    ``metadata.pickle``."""
    if not out_path.endswith(".npz"):
        out_path += ".npz"   # np.savez appends it anyway; return truth
    arrays = {}
    for section in ("params", "aux"):
        keys, leaves, _ = _flat_with_paths(eval_vars[section])
        for k, leaf in zip(keys, leaves):
            arrays[f"{section}/{k}"] = np.asarray(leaf)
    if config:
        for k in ("img_size", "num_classes", "z_dim"):
            if k in config:
                arrays[f"meta/{k}"] = np.asarray(int(config[k]))
    np.savez(out_path, **arrays)
    return out_path


def load_generator_npz(config: dict, path: str):
    """(generator, eval variables) from an ``export_generator_npz`` file
    — structure comes from the config's architecture; every template
    leaf must be present in the archive."""
    gen = get_generator(config)
    template = gen.init(jax.random.PRNGKey(0))
    with np.load(path) as data:
        out = {}
        for section in ("params", "aux"):
            keys, leaves, treedef = _flat_with_paths(template[section])
            new = []
            for k, leaf in zip(keys, leaves):
                name = f"{section}/{k}"
                if name not in data:
                    raise KeyError(
                        f"{path} lacks {name} — architecture mismatch "
                        f"with the supplied config")
                arr = data[name]
                if arr.shape != leaf.shape:
                    raise ValueError(
                        f"{name}: shape {arr.shape} != template "
                        f"{leaf.shape}")
                new.append(jnp.asarray(arr, leaf.dtype))
            out[section] = jax.tree.unflatten(treedef, new)
    return gen, out


def build_serve_fn(gen):
    """Jitted serving path: (variables, latents, labels) → **uint8**
    images, de-normalized ON DEVICE.

    The float sample path (:func:`~sagan_tpu.train.trainer.build_sample_fn`)
    fetches float32 [-1, 1] images and de-normalizes on the host; every
    serving consumer (PNG grid, npz archive, an HTTP byte stream)
    ultimately wants ``uint8(x·127.5 + 127.5)``, so emitting uint8 from
    the device moves 4× fewer bytes over the host link — the dominant
    serving cost for a remote/tunneled accelerator (measured:
    tools/bench_generate.py).  Matches ``utils.images.denormalize``
    within ±1 LSB (f32 rounding of ties may differ between XLA and
    numpy)."""

    def serve(vars_g, z, labels):
        imgs, _ = gen(vars_g, z, labels, train=False)
        x = imgs.astype(jnp.float32) * 127.5 + 127.5
        return jnp.clip(x, 0, 255).astype(jnp.uint8)

    return jax.jit(serve)


def sample_images(gen, eval_vars, num: int, batch: int, z_dim: int,
                  num_classes: int, seed: int = 0, truncation: float = 0.0,
                  class_id: int = -1, as_uint8: bool = False) -> np.ndarray:
    """Generate ``num`` images → [num, H, W, 3]: float in [-1, 1], or
    de-normalized uint8 when ``as_uint8`` (device-side conversion, 4×
    smaller host fetch — the CLI's path)."""
    sample_fn = (build_serve_fn(gen) if as_uint8
                 else build_sample_fn(gen, mesh=None))
    key = jax.random.PRNGKey(seed)
    out = []
    for begin in range(0, num, batch):
        n = min(batch, num - begin)
        key, kz, kl = jax.random.split(key, 3)
        if truncation and truncation > 0:
            z = jax.random.truncated_normal(
                kz, -truncation, truncation, (batch, z_dim))
        else:
            z = jax.random.normal(kz, (batch, z_dim))
        if class_id >= 0:
            labels = jnp.full((batch,), class_id, jnp.int32)
        else:
            labels = jax.random.randint(kl, (batch,), 0, num_classes)
        imgs = sample_fn(eval_vars, z, labels)
        out.append(np.asarray(jax.device_get(imgs))[:n])
    return np.concatenate(out)[:num]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="sample images from a trained sagan-tpu checkpoint")
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--truncation", type=float, default=0.0,
                    help="truncation-trick threshold (0 = off)")
    ap.add_argument("--class_id", type=int, default=-1,
                    help="fix the class for conditional models")
    ap.add_argument("--out", default=None,
                    help="output dir (default samples/<config name>)")
    ap.add_argument("--format", choices=("png", "npz", "both"),
                    default="png")
    ap.add_argument("--step", type=int, default=None,
                    help="restore this checkpointed step (default latest)")
    ap.add_argument("--weights", default=None,
                    help="sample from an exported generator .npz instead "
                         "of a checkpoint directory")
    ap.add_argument("--export", default=None, metavar="G_NPZ",
                    help="export the evaluation generator to a "
                         "standalone .npz (serving without Orbax) and "
                         "exit")
    args = ap.parse_args(argv)

    import sys

    from .utils.device import wait_for_devices
    # heartbeat to stderr: stdout lists the written sample paths
    wait_for_devices(stream=sys.stderr)

    config = resolve_config(load_config_file(args.config_path))
    if "img_size" not in config or "num_classes" not in config:
        # model geometry lives in the dataset metadata, merged into the
        # config at train time (/root/reference/sagan/dataset.py:134-136)
        # — but an exported npz embeds it (meta/*), so the serving path
        # (config + one weights file) needs no dataset on the box
        filled = False
        if args.weights and os.path.exists(args.weights):
            with np.load(args.weights) as data:
                for k in ("img_size", "num_classes"):
                    if f"meta/{k}" in data:
                        config.setdefault(k, int(data[f"meta/{k}"]))
            filled = "img_size" in config and "num_classes" in config
        if not filled:
            from .data.tfrecord import load_metadata
            try:
                config.update(load_metadata(config["data_path"]))
            except FileNotFoundError:
                raise SystemExit(
                    f"config lacks img_size/num_classes and no "
                    f"metadata.pickle under {config['data_path']!r}")
    num_classes = max(1, config.get("num_classes", 1))
    if args.class_id >= num_classes:
        # jnp.take clamps out-of-range ids under jit — every sample
        # would silently come from the LAST class instead of erroring
        raise SystemExit(
            f"--class_id {args.class_id} out of range for "
            f"num_classes={num_classes}")
    if args.weights:
        gen, eval_vars = load_generator_npz(config, args.weights)
    else:
        gen, eval_vars = restore_eval_state(config, step=args.step)
    if args.export:
        path = export_generator_npz(gen, eval_vars, args.export,
                                    config=config)
        print(f"exported generator weights: {path}")
        return [path]
    imgs = sample_images(
        gen, eval_vars, num=args.num, batch=args.batch,
        z_dim=config["z_dim"],
        num_classes=num_classes,
        seed=args.seed, truncation=args.truncation, class_id=args.class_id,
        as_uint8=True)

    out_dir = args.out or os.path.join(
        "samples", os.path.splitext(os.path.basename(args.config_path))[0])
    os.makedirs(out_dir, exist_ok=True)
    written = []
    if args.format in ("png", "both"):
        path = os.path.join(out_dir, f"samples_seed{args.seed}.png")
        save_image_grid(imgs, path)
        written.append(path)
    if args.format in ("npz", "both"):
        path = os.path.join(out_dir, f"samples_seed{args.seed}.npz")
        # imgs is already device-denormalized uint8 (build_serve_fn)
        np.savez_compressed(path, images=imgs)
        written.append(path)
    print(f"wrote {args.num} samples: " + ", ".join(written))
    return written


if __name__ == "__main__":
    main()
