"""Data pipeline tests: codec roundtrip, TF interop (on-disk contract),
loader semantics (shuffle, sharding, drop-remainder, data_size)."""

import os
import pickle

import numpy as np
import pytest

from sagan_tpu.data.loader import ImageDataset, get_dataset_and_info
from sagan_tpu.data.synthetic import make_synthetic_dataset
from sagan_tpu.data.tfrecord import (TFRecordWriter, _crc32c_py, crc32c,
                                     decode_example, encode_example,
                                     load_metadata, masked_crc32c,
                                     parse_image_example, read_records,
                                     write_image_dataset)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283
    assert _crc32c_py(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c_py(b"123456789") == 0xE3069283


def test_example_codec_roundtrip():
    feats = {
        "image_raw": bytes(range(256)) * 3,
        "label": [7],
        "floats": [1.5, -2.25],
    }
    ex = decode_example(encode_example(feats))
    assert ex["image_raw"] == feats["image_raw"]
    assert ex["label"] == [7]
    assert ex["floats"] == [1.5, -2.25]


def test_example_codec_negative_int64():
    ex = decode_example(encode_example({"label": [-3]}))
    assert ex["label"] == [-3]


def test_record_file_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    payloads = [b"alpha", b"b" * 5000, b""]
    with TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(read_records(path, verify=True)) == payloads


def test_image_dataset_contract(tmp_path):
    d = str(tmp_path / "ds")
    imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(10)]
    labels = list(range(10))
    n = write_image_dataset(d, imgs, labels, img_size=8, num_classes=10)
    assert n == 10
    meta = load_metadata(d)
    assert meta == {"img_size": 8, "num_classes": 10, "num_records": 10}
    recs = list(read_records(os.path.join(d, "data.tfrecords")))
    img, label = parse_image_example(recs[3], 8)
    assert label == 3
    assert np.all(img == 3)


def test_tensorflow_reads_our_records(tmp_path):
    """On-disk contract oracle: TensorFlow's own parser must read files we
    write, exactly as the reference's input pipeline would
    (/root/reference/sagan/dataset.py:19-36)."""
    tf = pytest.importorskip("tensorflow")
    d = str(tmp_path / "ds")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(4)]
    write_image_dataset(d, imgs, [0, 1, 2, 3], img_size=8, num_classes=4)

    ds = tf.data.TFRecordDataset(os.path.join(d, "data.tfrecords"))
    feature_desc = {
        "label": tf.io.FixedLenFeature([], tf.int64),
        "image_raw": tf.io.FixedLenFeature([], tf.string),
    }
    out = []
    for raw in ds:
        ex = tf.io.parse_single_example(raw, feature_desc)
        img = tf.reshape(tf.io.decode_raw(ex["image_raw"], tf.uint8),
                         [8, 8, 3])
        out.append((img.numpy(), int(ex["label"].numpy())))
    assert len(out) == 4
    for i, (img, label) in enumerate(out):
        assert label == i
        np.testing.assert_array_equal(img, imgs[i])


def test_we_read_tensorflow_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecords")
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    with tf.io.TFRecordWriter(path) as w:
        ex = tf.train.Example(features=tf.train.Features(feature={
            "image_raw": tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[img.tobytes()])),
            "label": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[5])),
        }))
        w.write(ex.SerializeToString())
    recs = list(read_records(path, verify=True))
    got_img, got_label = parse_image_example(recs[0], 8)
    assert got_label == 5
    np.testing.assert_array_equal(got_img, img)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(d), num=64, img_size=8, num_classes=4)


def test_loader_batches_and_drop_remainder(synth_dir):
    ds = ImageDataset(synth_dir, batch_size=10, shuffle_buffer=16)
    batches = list(ds.epoch(0))
    assert len(batches) == 6  # 64 // 10, remainder dropped
    assert ds.steps_per_epoch == 6
    imgs, labels = batches[0]
    assert imgs.shape == (10, 8, 8, 3) and imgs.dtype == np.uint8
    assert labels.shape == (10,) and labels.dtype == np.int32


def test_loader_shuffles_between_epochs(synth_dir):
    ds = ImageDataset(synth_dir, batch_size=16, shuffle_buffer=64)
    a = np.concatenate([b[1] for b in ds.epoch(0)])
    b = np.concatenate([b[1] for b in ds.epoch(1)])
    assert a.shape == b.shape == (64,)
    assert not np.array_equal(a, b)
    assert sorted(a.tolist()) == sorted(b.tolist())  # same multiset


def test_loader_data_size_truncation(synth_dir):
    ds = ImageDataset(synth_dir, batch_size=8, data_size=24)
    assert ds.steps_per_epoch == 3
    assert len(list(ds.epoch(0))) == 3


def test_loader_multihost_sharding_partitions_records(synth_dir):
    shards = []
    for pi in range(2):
        ds = ImageDataset(synth_dir, batch_size=16, shuffle_buffer=1,
                          process_index=pi, process_count=2)
        shards.append(np.concatenate([b[1] for b in ds.epoch(0)]))
    assert len(shards[0]) == len(shards[1]) == 32
    # together the shards cover the full dataset exactly once
    all_labels = sorted(np.concatenate(shards).tolist())
    full = ImageDataset(synth_dir, batch_size=64, shuffle_buffer=1)
    expected = sorted(np.concatenate([b[1] for b in full.epoch(0)]).tolist())
    assert all_labels == expected


def test_get_dataset_and_info_merges_metadata(synth_dir):
    config = {"data_path": synth_dir, "batch_size": 8,
              "global_batch_size": 16}
    ds, cfg = get_dataset_and_info(config)
    assert cfg["img_size"] == 8 and cfg["num_classes"] == 4
    assert cfg["num_records"] == 64
    assert ds.batch_size == 16  # single host: per-host == global


def test_sharded_write_and_parallel_read(tmp_path):
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "sharded"), num=120,
                               img_size=8, num_classes=6, num_shards=4)
    files = sorted(os.listdir(d))
    assert sum(f.endswith(".tfrecords") for f in files) == 4
    assert "data-00000-of-00004.tfrecords" in files

    # parallel multi-file read covers the same multiset as sequential
    par = ImageDataset(d, batch_size=120, shuffle_buffer=1, num_workers=4)
    seq = ImageDataset(d, batch_size=120, shuffle_buffer=1, num_workers=1)
    lp = np.concatenate([b[1] for b in par.epoch(0)])
    ls = np.concatenate([b[1] for b in seq.epoch(0)])
    assert sorted(lp.tolist()) == sorted(ls.tolist())


def test_parallel_multi_file_read_is_deterministic(tmp_path):
    """The worker merge is deterministic round-robin, so the item (and
    therefore batch) stream is identical across reads — required for
    exact mid-epoch preemption resume (trainer replays + skips the host
    stream)."""
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "det"), num=120,
                               img_size=8, num_classes=6, num_shards=4)
    for cache in (False, True):  # streaming round-robin AND cached path
        runs = []
        for _ in range(3):
            ds = ImageDataset(d, batch_size=8, shuffle_buffer=16,
                              num_workers=4, cache_in_memory=cache)
            runs.append(np.concatenate([b[1] for b in ds.epoch(0)]))
        assert runs[0].tolist() == runs[1].tolist() == runs[2].tolist()
        # and a fresh reader mid-stream (resume) sees the same prefix
        ds = ImageDataset(d, batch_size=8, shuffle_buffer=16,
                          num_workers=4, cache_in_memory=cache)
        first5 = [b[1].copy() for _, b in zip(range(5), ds.epoch(0))]
        np.testing.assert_array_equal(np.concatenate(first5), runs[0][:40])


def test_cached_epochs_match_streaming_content(tmp_path):
    """cache_in_memory serves the same multiset as the streaming path,
    reshuffled per epoch, with identical steps_per_epoch."""
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "cache"), num=96, img_size=8,
                               num_classes=6, num_shards=2)
    stream = ImageDataset(d, batch_size=8, shuffle_buffer=4,
                          cache_in_memory=False)
    cached = ImageDataset(d, batch_size=8, shuffle_buffer=4,
                          cache_in_memory=True)
    assert stream.steps_per_epoch == cached.steps_per_epoch
    ls = np.concatenate([b[1] for b in stream.epoch(0)])
    lc0 = np.concatenate([b[1] for b in cached.epoch(0)])
    lc1 = np.concatenate([b[1] for b in cached.epoch(1)])
    assert sorted(ls.tolist()) == sorted(lc0.tolist())
    assert lc0.tolist() != lc1.tolist()          # reshuffled across epochs
    lc0b = np.concatenate([b[1] for b in cached.epoch(0)])
    assert lc0.tolist() == lc0b.tolist()         # (seed, epoch) determinism


def test_file_sharding_across_hosts(tmp_path):
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "hosts"), num=128,
                               img_size=8, num_classes=8, num_shards=4)
    shards = []
    for pi in range(2):
        ds = ImageDataset(d, batch_size=64, shuffle_buffer=1,
                          process_index=pi, process_count=2, num_workers=2)
        shards.append(np.concatenate([b[1] for b in ds.epoch(0)]))
    together = sorted(np.concatenate(shards).tolist())
    full = ImageDataset(d, batch_size=128, shuffle_buffer=1)
    expected = sorted(np.concatenate([b[1] for b in full.epoch(0)]).tolist())
    assert together == expected


def test_lockstep_equal_batch_count_with_uneven_shards(tmp_path):
    """Hosts with unequal local record counts still yield exactly
    steps_per_epoch batches each (truncate-or-wrap): unequal counts
    would desync the per-host train-step calls and hang the cross-host
    gradient collective."""
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    # 3 shard files over 2 hosts: host0 owns 2 files, host1 owns 1
    d = make_synthetic_dataset(str(tmp_path / "uneven"), num=120,
                               img_size=8, num_classes=4, num_shards=3)
    counts = []
    for pi in range(2):
        ds = ImageDataset(d, batch_size=10, shuffle_buffer=1,
                          process_index=pi, process_count=2,
                          num_workers=2, cache_in_memory=False)
        n = sum(1 for _ in ds.epoch(0))
        assert n == ds.steps_per_epoch, (pi, n, ds.steps_per_epoch)
        counts.append(n)
    assert counts[0] == counts[1] == 120 // 2 // 10
    # cached path obeys the same contract
    for pi in range(2):
        ds = ImageDataset(d, batch_size=10, shuffle_buffer=1,
                          process_index=pi, process_count=2,
                          num_workers=2, cache_in_memory=True)
        assert sum(1 for _ in ds.epoch(0)) == ds.steps_per_epoch


def test_corrupt_record_propagates_from_prefetch_thread(tmp_path):
    """A corrupt TFRecord must raise at the consumer, not silently end
    the epoch early (which would train on a truncated dataset and,
    multi-host, hang the other processes in a collective)."""
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "c"), num=64, img_size=8,
                               num_classes=4)
    path = os.path.join(d, "data.tfrecords")
    with open(path, "r+b") as f:
        f.seek(0, os.SEEK_END)
        size = f.tell()
        f.truncate(size // 2 + 7)   # chop mid-record (off any boundary)
    # metadata still claims 64 records; the stream must error, not stop
    ds = ImageDataset(d, batch_size=8, shuffle_buffer=1,
                      cache_in_memory=False, use_native=False)
    with pytest.raises(Exception):
        list(ds.epoch(0))


def test_bitrot_payload_raises_by_default(tmp_path):
    """A flipped payload byte (framing lengths intact) must raise on
    BOTH reader paths with the default config — tf.data raises
    DataLossError here (the reference's reader, sagan/dataset.py:12-16);
    silently training on garbage pixels is not acceptable parity."""
    from sagan_tpu.data.synthetic import make_synthetic_dataset

    d = make_synthetic_dataset(str(tmp_path / "b"), num=16, img_size=8,
                               num_classes=2)
    path = os.path.join(d, "data.tfrecords")
    with open(path, "r+b") as f:
        f.seek(12 + 40)              # inside the first record's payload
        b = f.read(1)
        f.seek(-1, os.SEEK_CUR)
        f.write(bytes([b[0] ^ 0xFF]))

    for use_native in (False, True):
        if use_native:
            from sagan_tpu.data import native
            if not native.available():
                continue
        ds = ImageDataset(d, batch_size=4, shuffle_buffer=1,
                          cache_in_memory=False, use_native=use_native)
        with pytest.raises(Exception, match="(?i)crc|corrupt"):
            list(ds.epoch(0))
        # explicit opt-out still reads (the old behavior, for salvage)
        ds2 = ImageDataset(d, batch_size=4, shuffle_buffer=1,
                           cache_in_memory=False, use_native=use_native,
                           verify_crc=False)
        assert len(list(ds2.epoch(0))) == 4
