"""Dataset converter CLI round-trip: image directories → TFRecords →
loader, for both the imagenet and LSUN layouts (reference contract:
/root/reference/sagan/utils/convert_dataset_to_tfrecords.py)."""

import os

import numpy as np
import pytest

from sagan_tpu.data.convert import main as convert_main
from sagan_tpu.data.loader import ImageDataset
from sagan_tpu.data.tfrecord import load_metadata


def _write_png(path, rng, size=(40, 30)):
    from PIL import Image

    arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def test_imagenet_layout_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    for ci, wnid in enumerate(["n01440764", "n01443537", "n01484850"]):
        d = tmp_path / "train" / wnid
        d.mkdir(parents=True)
        for i in range(4):
            _write_png(str(d / f"{wnid}_{i}.JPEG"), rng)

    out = convert_main(["--path", str(tmp_path), "--dataset", "imagenet",
                        "--img_size", "16", "--n_class", "2"])
    meta = load_metadata(out)
    # first n_class sorted dirs only, 4 images each
    assert meta["num_classes"] == 2
    assert meta["num_records"] == 8
    assert meta["img_size"] == 16

    ds = ImageDataset(out, batch_size=8, shuffle_buffer=1)
    imgs, labels = next(iter(ds.epoch(0)))
    assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
    assert set(labels.tolist()) == {0, 1}


def test_lsun_layout_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "data"
    d.mkdir()
    for i in range(6):
        _write_png(str(d / f"img_{i}.jpg"), rng, size=(25, 50))

    out = convert_main(["--path", str(tmp_path), "--dataset", "Lsun_church",
                        "--img_size", "16"])
    meta = load_metadata(out)
    assert meta["num_records"] == 6
    assert meta["num_classes"] == 1

    ds = ImageDataset(out, batch_size=6, shuffle_buffer=1)
    imgs, labels = next(iter(ds.epoch(0)))
    assert imgs.shape == (6, 16, 16, 3)
    assert set(labels.tolist()) == {0}   # LSUN: everything label 0


def test_flat_layout_uppercase_extensions(tmp_path):
    """IMG_0001.JPG-style camera exports must be found by the flat
    gatherer (extensions matched case-insensitively)."""
    import numpy as np
    from PIL import Image

    from sagan_tpu.data.convert import _gather_flat

    root = tmp_path / "flat"
    root.mkdir()
    rng = np.random.default_rng(0)
    for name in ("IMG_0001.JPG", "b.PNG", "c.jpeg", "notes.txt"):
        p = root / name
        if name.endswith(".txt"):
            p.write_text("skip me")
        else:
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(p)
    files, n_classes = _gather_flat(str(root))
    assert n_classes == 1
    assert sorted(os.path.basename(f) for f, _ in files) == \
        ["IMG_0001.JPG", "b.PNG", "c.jpeg"]
