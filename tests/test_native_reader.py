"""Native C++ TFRecord reader vs. pure-Python oracle."""

import os
import time

import numpy as np
import pytest

from sagan_tpu.data import native
from sagan_tpu.data.synthetic import make_synthetic_dataset
from sagan_tpu.data.tfrecord import (_crc32c_py, parse_image_example,
                                     read_records, write_image_dataset)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_crc32c_matches_python():
    for data in [b"", b"123456789", b"\x00" * 32, os.urandom(10_000)]:
        assert native.crc32c(data) == _crc32c_py(data)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_ds")
    return make_synthetic_dataset(str(d), num=300, img_size=16,
                                  num_classes=7, seed=3)


def test_native_decodes_identically(dataset_dir):
    path = os.path.join(dataset_dir, "data.tfrecords")
    py = [parse_image_example(r, 16) for r in read_records(path)]
    nat_imgs, nat_labels = [], []
    for imgs, labels in native.native_read_image_examples(path, 16,
                                                          chunk=128,
                                                          verify=True):
        nat_imgs.append(imgs.copy())
        nat_labels.append(labels.copy())
    nat_imgs = np.concatenate(nat_imgs)
    nat_labels = np.concatenate(nat_labels)
    assert len(nat_imgs) == len(py) == 300
    for i, (img, label) in enumerate(py):
        np.testing.assert_array_equal(nat_imgs[i], img)
        assert nat_labels[i] == label


def test_native_rejects_corrupt_crc(tmp_path):
    d = str(tmp_path / "ds")
    imgs = [np.zeros((8, 8, 3), np.uint8)]
    write_image_dataset(d, imgs, [0], img_size=8, num_classes=1)
    path = os.path.join(d, "data.tfrecords")
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError, match="corrupt"):
        list(native.native_read_image_examples(path, 8, verify=True))
    # without verification the corrupted byte flows through
    out = list(native.native_read_image_examples(path, 8, verify=False))
    assert len(out) == 1


def test_native_size_mismatch_error(dataset_dir):
    path = os.path.join(dataset_dir, "data.tfrecords")
    with pytest.raises(IOError, match="size mismatch"):
        list(native.native_read_image_examples(path, 32))


def test_loader_native_and_python_paths_agree(dataset_dir):
    from sagan_tpu.data.loader import ImageDataset

    a = ImageDataset(dataset_dir, batch_size=50, shuffle_buffer=1,
                     use_native=True)
    b = ImageDataset(dataset_dir, batch_size=50, shuffle_buffer=1,
                     use_native=False)
    for (ia, la), (ib, lb) in zip(a.epoch(0), b.epoch(0)):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_native_throughput_exceeds_python(tmp_path):
    """The reason this component exists: native decode must beat the
    Python codec on realistic (64px) records — measured ~4.5x here."""
    d = make_synthetic_dataset(str(tmp_path / "perf"), num=500,
                               img_size=64, num_classes=4)
    path = os.path.join(d, "data.tfrecords")
    list(native.native_read_image_examples(path, 64))  # warm page cache

    t0 = time.perf_counter()
    n_nat = sum(img.shape[0] for img, _ in
                native.native_read_image_examples(path, 64))
    t_nat = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_py = sum(1 for r in read_records(path)
               if parse_image_example(r, 64))
    t_py = time.perf_counter() - t0

    assert n_nat == n_py == 500
    assert t_nat < t_py, (t_nat, t_py)
