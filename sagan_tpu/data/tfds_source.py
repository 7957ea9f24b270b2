"""TFDS → TFRecord-contract converter (optional, gated on
``tensorflow_datasets``).

Parity with the reference's tfds path — which is dead code there
(``get_dataset_from_tfds`` written for celeb_a, call site commented out,
/root/reference/sagan/dataset.py:111-133) and its
``convert_tfds_to_tfrecords.ipynb`` notebook.  Rather than a live tfds
input pipeline, we convert once into the standard on-disk contract
(raw-uint8 TFRecords + metadata.pickle) so training always runs through
the native-reader fast path.

    python -m sagan_tpu.data.tfds_source celeb_a out_dir --img_size 64
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_tfds(name: str, out_dir: str, img_size: int,
                 split: str = "train", limit: int = -1) -> int:
    try:
        import tensorflow_datasets as tfds
    except ImportError as e:
        raise ImportError(
            "the tfds converter needs the 'tensorflow_datasets' package"
        ) from e
    from PIL import Image

    from .tfrecord import write_image_dataset

    ds, info = tfds.load(name, split=split, with_info=True)
    num_classes = (info.features["label"].num_classes
                   if "label" in info.features else 1)

    def items():
        for i, ex in enumerate(tfds.as_numpy(ds)):
            if limit > 0 and i >= limit:
                return
            img = ex["image"]
            if img.shape[:2] != (img_size, img_size):
                img = np.asarray(
                    Image.fromarray(img).resize((img_size, img_size),
                                                Image.LANCZOS))
            yield img.astype(np.uint8), int(ex.get("label", 0))

    pairs = list(items())
    return write_image_dataset(out_dir, (p[0] for p in pairs),
                               (p[1] for p in pairs), img_size, num_classes)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", help="tfds dataset name, e.g. celeb_a")
    ap.add_argument("out_dir")
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--split", default="train")
    ap.add_argument("--limit", type=int, default=-1)
    args = ap.parse_args(argv)
    n = convert_tfds(args.name, args.out_dir, args.img_size, args.split,
                     args.limit)
    print(f"wrote {n} records to {args.out_dir}")


if __name__ == "__main__":
    main()
