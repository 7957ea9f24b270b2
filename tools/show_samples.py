"""Dataset / checkpoint visualization CLI — the script analog of the
reference's ``show_sample.ipynb`` / ``data_aug_by_generator.ipynb``
notebooks (SURVEY.md §2.1 Notebooks row).

    # dump a grid of dataset batches (exercises the full input pipeline,
    # incl. augmentation when --image_folder):
    python tools/show_samples.py data <data_path> --out samples.png
    # dump a generator sample grid from a checkpointed run:
    python tools/show_samples.py model <config.py> --out gen.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def show_data(args):
    from sagan_tpu.data.loader import ImageDataset
    from sagan_tpu.data.image_folder import ImageFolderDataset
    from sagan_tpu.utils.images import save_image_grid

    if args.image_folder:
        ds = ImageFolderDataset(args.path, batch_size=args.num,
                                img_size=args.img_size)
    else:
        ds = ImageDataset(args.path, batch_size=args.num)
    imgs, labels = next(iter(ds.epoch(0)))
    floats = imgs.astype(np.float32) * (2.0 / 255.0) - 1.0
    save_image_grid(floats, args.out)
    print(f"labels: {labels.tolist()}")
    print(f"wrote {args.out}")


def show_model(args):
    # dataset-free: restore just the generator through generate.py's
    # eval path (building the full Trainer would demand the training
    # tfrecords on disk and waste a D + optimizer + train-step build
    # for what is only a sampling call)
    from sagan_tpu.generate import restore_eval_state, sample_images
    from sagan_tpu.utils.config import load_config_file, resolve_config
    from sagan_tpu.utils.images import save_image_grid

    config = resolve_config(load_config_file(args.path))
    if "img_size" not in config or "num_classes" not in config:
        from sagan_tpu.data.tfrecord import load_metadata
        try:
            config.update(load_metadata(config["data_path"]))
        except FileNotFoundError:
            raise SystemExit(
                "config lacks img_size/num_classes and no "
                "metadata.pickle is present — pass a trained run's config")
    gen, eval_vars = restore_eval_state(config)
    imgs = sample_images(gen, eval_vars, num=args.num, batch=args.num,
                         z_dim=config["z_dim"],
                         num_classes=max(1, config.get("num_classes", 1)),
                         seed=config.get("seed", 0))
    save_image_grid(imgs, args.out)
    print(f"wrote {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("data")
    d.add_argument("path")
    d.add_argument("--out", default="samples.png")
    d.add_argument("--num", type=int, default=16)
    d.add_argument("--image_folder", action="store_true")
    d.add_argument("--img_size", type=int, default=64)
    m = sub.add_parser("model")
    m.add_argument("path", help="config .py (restores latest checkpoint)")
    m.add_argument("--out", default="generated.png")
    m.add_argument("--num", type=int, default=16)
    args = ap.parse_args(argv)
    if args.cmd == "data":
        show_data(args)
    else:
        show_model(args)


if __name__ == "__main__":
    main()
