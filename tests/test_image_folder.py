"""Image-folder (use_image_generator) path + legacy CLI config tests."""

import os

import numpy as np
import pytest
from PIL import Image

from sagan_tpu.data.image_folder import ImageFolderDataset, _augment
from sagan_tpu.data.loader import get_dataset_and_info


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgdir")
    rng = np.random.default_rng(0)
    for cls in ["cat", "dog"]:
        d = root / cls
        d.mkdir()
        for i in range(12):
            arr = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_folder_scan_classes(folder):
    ds = ImageFolderDataset(folder, batch_size=4, img_size=16)
    assert ds.num_classes == 2
    assert ds.num_records == 24
    assert ds.steps_per_epoch == 6


def test_folder_batches(folder):
    ds = ImageFolderDataset(folder, batch_size=5, img_size=16, seed=1)
    batches = list(ds.epoch(0))
    assert len(batches) == 4
    imgs, labels = batches[0]
    assert imgs.shape == (5, 16, 16, 3) and imgs.dtype == np.uint8
    assert set(np.unique(labels)).issubset({0, 1})


def test_folder_epochs_reshuffle(folder):
    ds = ImageFolderDataset(folder, batch_size=24, img_size=16,
                            shift=0, brightness=None, hflip=False)
    a = next(iter(ds.epoch(0)))[1]
    b = next(iter(ds.epoch(1)))[1]
    assert sorted(a.tolist()) == sorted(b.tolist())
    assert not np.array_equal(a, b)


def test_augment_shapes_preserved():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = _augment(img, rng, shift=0.3, brightness=(0.7, 1.3), hflip=True)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_get_dataset_and_info_image_generator_path(folder):
    cfg = {"data_path": folder, "use_image_generator": True,
           "img_size": 16, "batch_size": 4, "global_batch_size": 8}
    ds, out = get_dataset_and_info(cfg)
    assert isinstance(ds, ImageFolderDataset)
    assert out["num_classes"] == 2 and out["num_records"] == 24


def test_legacy_cli_config_mapping():
    from sagan_tpu.legacy_main import build_config

    class A:
        debug = False
        path_root = "runroot"
        data_path = "/data/x"
        z_dim = 64
        batch_size = 8
        loss = "hinge_loss"
        epoch = 3
        update_ratio = 2
        data_size = 100
        num_sample = 16

    cfg = build_config(A())
    assert cfg["model"] == "resnet" and cfg["img_size"] == 128
    assert cfg["use_label"] and cfg["attn_dim_G"] == [32]
    assert cfg["lr_g"] == 1e-4 and cfg["lr_d"] == 4e-4
    assert cfg["log_dir"] == "runroot/logs"


def test_legacy_cli_end_to_end(tmp_path, monkeypatch):
    """The legacy flat-flag driver (/root/reference/main.py:190-222)
    trains end-to-end: dataset metadata overrides the hardcoded 128px,
    --debug skips checkpointing, one epoch completes with finite
    losses."""
    import numpy as np

    from sagan_tpu.data.synthetic import make_synthetic_dataset
    from sagan_tpu.legacy_main import main as legacy_main

    data = make_synthetic_dataset(str(tmp_path / "ds"), num=16, img_size=16,
                                  num_classes=4, seed=2)
    monkeypatch.chdir(tmp_path)
    trainer = legacy_main([
        "--debug", "--path_root", str(tmp_path / "run"),
        "--data_path", data, "-b", "2", "-e", "1", "-n", "4"])
    assert trainer.global_step() == trainer.steps_per_epoch > 0
    assert trainer.config["img_size"] == 16     # metadata won
    assert np.isfinite(trainer.sample_images()).all()
