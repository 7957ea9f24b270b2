"""Host-side data pipeline: TFRecord streaming → shuffle → batch → prefetch.

Replaces the reference's ``tf.data`` graph (/root/reference/sagan/
dataset.py:12-40: glob ``*.tfrecords`` → parse → scale → ``.take(data_size)
.shuffle(30000).map(...).batch(global, drop_remainder=True)``) with an
explicitly TPU-oriented design:

* batches leave the host as **uint8** — normalization to [-1, 1] happens
  on device inside the jitted train step, quartering host→HBM transfer
  bytes vs. shipping float32;
* reservoir-style shuffle buffer (default 30000 records, matching
  BUFFER_SIZE at sagan/dataset.py:10), reseeded per epoch;
* multi-host sharding by record index stride (process_index/process_count)
  — the per-host analog of MirroredStrategy's dataset distribution;
* a daemon-thread prefetcher keeps ``prefetch_depth`` batches ready so
  host IO overlaps device compute;
* decode fast path through the native C++ record reader when built
  (sagan_tpu/data/native), pure-Python codec otherwise.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator

import numpy as np

from .tfrecord import load_metadata, parse_image_example, read_records

SHUFFLE_BUFFER = 30000  # /root/reference/sagan/dataset.py:10


def _find_files(data_path: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(data_path, "*.tfrecords")))
    if not files:
        raise FileNotFoundError(f"no *.tfrecords under {data_path}")
    return files


class ImageDataset:
    """Epoch-oriented iterator of (uint8 images [B,S,S,3], int32 labels [B]).

    ``batch_size`` is the *per-host* batch (the global batch divided by
    process count); sharding over devices within a host happens at
    device-put time in the trainer.
    """

    def __init__(self, data_path: str, batch_size: int,
                 data_size: int = -1, shuffle_buffer: int = SHUFFLE_BUFFER,
                 seed: int = 0, process_index: int = 0,
                 process_count: int = 1, prefetch_depth: int = 2,
                 use_native: bool | None = None, num_workers: int = 4,
                 cache_in_memory: bool | None = None,
                 verify_crc: bool = True):
        self.files = _find_files(data_path)
        self.meta = load_metadata(data_path)
        if use_native is None:
            from . import native
            use_native = native.available()
        self.use_native = use_native
        # CRC verification on by default, matching tf.data's
        # DataLossError contract (the reference's reader,
        # sagan/dataset.py:12-16): bit-rot must raise, not silently
        # train on garbage.  Cheap — crc32c is C on both read paths.
        self.verify_crc = verify_crc
        self.num_workers = max(1, num_workers)
        self.img_size = int(self.meta["img_size"])
        self.num_classes = int(self.meta["num_classes"])
        self.num_records = int(self.meta["num_records"])
        self.batch_size = batch_size
        self.data_size = data_size
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch_depth = prefetch_depth

        total = self.num_records if data_size in (-1, None) \
            else min(data_size, self.num_records)
        per_host = total // process_count
        self.steps_per_epoch = per_host // batch_size

        # In-memory decoded cache: once the (sharded, truncated) item
        # stream is materialized, later epochs serve from RAM with an
        # exact per-epoch shuffle — disk decode was the dominant cost of
        # real training loops (the reference's shuffle(30000) buffer
        # effectively did the same for its small datasets).  Auto-on for
        # per-host data below 2 GB; set cache_in_memory to override.
        if cache_in_memory is None:
            img_bytes = self.img_size * self.img_size * 3
            cache_in_memory = per_host * img_bytes <= 2 << 30
        self.cache_in_memory = cache_in_memory
        self._cache = None

    # -- decoded item stream -----------------------------------------------
    def _items(self) -> Iterator[tuple]:
        """Yield (uint8 [S,S,3] image, int label), sharded + truncated.

        Host sharding: by file when there are at least ``process_count``
        shard files (each host owns a disjoint file subset and can read
        its shard with parallel workers); otherwise by global record
        index stride (exact, but inherently sequential)."""
        limit = self.data_size if self.data_size not in (-1, None) else None
        shard_by_file = (self.process_count == 1
                         or len(self.files) >= self.process_count)
        if shard_by_file:
            files = self.files[self.process_index::self.process_count]
            if limit is not None:
                # per-host share of the global take(data_size)
                limit = limit // self.process_count
            produced = 0
            for img, label in self._multi_file_items(files):
                if limit is not None and produced >= limit:
                    return
                yield img, label
                produced += 1
        else:
            idx = 0
            for path in self.files:
                for img, label in self._file_items(path):
                    if limit is not None and idx >= limit:
                        return
                    if idx % self.process_count == self.process_index:
                        yield img, label
                    idx += 1

    def _multi_file_items(self, files: list) -> Iterator[tuple]:
        """Read ``files`` with up to ``num_workers`` threads, merged by
        **deterministic round-robin**: worker ``w`` owns
        ``files[w::workers]`` (read in order) and the consumer pops one
        item per live worker in fixed rotation.  Decode still runs in
        parallel, but the merged stream is a pure function of
        (files, workers) — so a preemption resume that replays and skips
        the host stream (trainer._device_batches) reproduces the exact
        remaining-batch schedule, with no record trained twice."""
        workers = min(self.num_workers, len(files))
        if workers <= 1:
            for path in files:
                yield from self._file_items(path)
            return

        _END = object()
        queues = [queue.Queue(maxsize=256) for _ in range(workers)]
        errors: list = []
        stop = threading.Event()

        def run(w: int):
            try:
                for path in files[w::workers]:
                    for item in self._file_items(path):
                        if not _put_with_stop(queues[w], item, stop):
                            return
            except Exception as e:  # surface reader errors to the consumer
                errors.append(e)
            finally:
                _put_with_stop(queues[w], _END, stop)

        threads = [threading.Thread(target=run, args=(w,), daemon=True)
                   for w in range(workers)]
        for t in threads:
            t.start()
        try:
            live = list(range(workers))
            while live:
                for w in list(live):
                    item = queues[w].get()
                    if item is _END:
                        live.remove(w)
                        # raise as soon as a worker dies, not after the
                        # full drain: a downstream consumer that stops at
                        # steps_per_epoch (_lockstep) would otherwise
                        # never see the error and train forever without
                        # the corrupt shard's data
                        if errors:
                            raise errors[0]
                        continue
                    yield item
        finally:
            stop.set()
        if errors:
            raise errors[0]

    def _file_items(self, path: str) -> Iterator[tuple]:
        if self.use_native:
            from .native import native_read_image_examples
            for imgs, labels in native_read_image_examples(
                    path, self.img_size, verify=self.verify_crc):
                for i in range(imgs.shape[0]):
                    yield imgs[i], int(labels[i])
        else:
            for rec in read_records(path, verify=self.verify_crc):
                yield parse_image_example(rec, self.img_size)

    def _shuffled(self, rng: np.random.Generator) -> Iterator[tuple]:
        buf: list[tuple] = []
        for item in self._items():
            if len(buf) < self.shuffle_buffer:
                buf.append(item)
                continue
            j = int(rng.integers(len(buf)))
            buf[j], item = item, buf[j]
            yield item
        rng.shuffle(buf)  # type: ignore[arg-type]
        yield from buf

    def _materialize(self) -> None:
        imgs, labels = [], []
        for img, label in self._items():
            imgs.append(img)
            labels.append(label)
        self._cache = (np.stack(imgs),
                       np.asarray(labels, np.int32))

    def materialized(self):
        """The full (sharded, truncated) local dataset as two arrays —
        the trainer's device-resident cache uploads these to HBM once
        (see Trainer._build_device_cache)."""
        if self._cache is None:
            self._materialize()
        return self._cache

    def epoch_index_batches(self, epoch_index: int) -> Iterator[np.ndarray]:
        """Per-batch record indices reproducing EXACTLY the cached
        ``epoch()`` schedule (same (seed, epoch, pass) permutation, same
        lockstep wraparound).  The device-cache feed sends these tiny
        int32 arrays over the host→device link instead of image bytes —
        the feed-path fix for remote-tunnel transfer-bound training."""
        n = len(self.materialized()[1])

        def gen(attempt: int):
            rng = np.random.default_rng((self.seed, epoch_index, attempt))
            order = rng.permutation(n)
            for i in range(n // self.batch_size):
                yield order[i * self.batch_size:
                            (i + 1) * self.batch_size].astype(np.int32)

        return _lockstep(gen, self.steps_per_epoch, self.process_index)

    # -- batches -----------------------------------------------------------
    def epoch(self, epoch_index: int = 0) -> Iterator[tuple]:
        """One pass over the (sharded) data, dropping the remainder
        (drop_remainder=True semantics, sagan/dataset.py:36)."""
        if self.cache_in_memory:
            if self._cache is None:
                self._materialize()
            imgs, labels = self._cache

            def cached_gen(attempt: int):
                # exact Fisher–Yates permutation per epoch (strictly
                # stronger than the streaming buffer shuffle, and still a
                # pure function of (seed, epoch, pass) — exact-resume safe)
                rng = np.random.default_rng(
                    (self.seed, epoch_index, attempt))
                order = rng.permutation(len(labels))
                for i in range(len(labels) // self.batch_size):
                    idx = order[i * self.batch_size:
                                (i + 1) * self.batch_size]
                    yield imgs[idx], labels[idx]

            return _prefetch(_lockstep(cached_gen, self.steps_per_epoch,
                                       self.process_index),
                             self.prefetch_depth)

        def gen(attempt: int):
            rng = np.random.default_rng((self.seed, epoch_index, attempt))
            imgs = np.empty((self.batch_size, self.img_size, self.img_size, 3),
                            np.uint8)
            labels = np.empty((self.batch_size,), np.int32)
            fill = 0
            for img, label in self._shuffled(rng):
                imgs[fill] = img
                labels[fill] = label
                fill += 1
                if fill == self.batch_size:
                    yield imgs.copy(), labels.copy()
                    fill = 0

        return _prefetch(_lockstep(gen, self.steps_per_epoch,
                                   self.process_index),
                         self.prefetch_depth)

    def __iter__(self):
        return self.epoch(0)


def _put_with_stop(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """Bounded-queue put that gives up when the consumer is gone (early
    break / preemption): without the stop check, an abandoned generator
    leaves producer threads blocked on a full queue forever, leaking
    threads and file handles each epoch."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


def _lockstep(make_gen, n: int, host: int = 0) -> Iterator[tuple]:
    """Yield EXACTLY ``n`` batches: truncate a long local stream and
    wrap around (re-shuffled) a short one.

    ``steps_per_epoch`` is derived from the *global* record count, but
    per-host sharding can leave hosts with unequal local record counts
    (uneven shard files, counts not divisible by the process count,
    skipped undecodable images).  Every host must issue the same number
    of train-step calls per epoch or the short host leaves the others
    blocked in the cross-host gradient collective — so the batch count,
    not the local stream length, is the epoch contract.  ``make_gen``
    takes a pass index and must re-derive its RNG from it, keeping the
    stream a pure function of the config (exact-resume safe)."""
    count = 0
    attempt = 0
    while count < n:
        produced = False
        for batch in make_gen(attempt):
            produced = True
            yield batch
            count += 1
            if count == n:
                return
        if not produced:
            raise RuntimeError(
                f"host {host}: data stream yielded no full batch "
                f"(need {n})")
        attempt += 1
        print(f"data: host {host} local stream ran short at {count}/{n} "
              f"batches; wrapping (pass {attempt}) to keep the global "
              f"step count in lockstep", flush=True)


def _prefetch(it: Iterator, depth: int) -> Iterator:
    """Run ``it`` in a daemon thread, keeping ``depth`` items ready.

    Pipeline errors propagate: an exception in the producing iterator is
    re-raised at the consumer's next pull — a corrupt record must stop
    the run, not silently truncate the epoch (a short host would also
    hang the other hosts of a multi-process run inside a collective).
    An abandoned consumer (early break / preemption) releases the
    worker via a stop flag instead of leaving it blocked on the queue.
    """
    if depth <= 0:
        yield from it
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    class _Error:
        def __init__(self, exc):
            self.exc = exc

    def worker():
        try:
            for item in it:
                if not _put_with_stop(q, item, stop):
                    return
            _put_with_stop(q, _END, stop)
        except BaseException as e:  # re-raised by the consumer below
            _put_with_stop(q, _Error(e), stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, _Error):
                raise item.exc
            yield item
    finally:
        stop.set()


def get_dataset_and_info(config: dict):
    """Reference-compatible entry point
    (/root/reference/sagan/dataset.py:131-143): loads metadata, merges
    ``{img_size, num_classes, num_records}`` into the config, and returns
    (dataset, config).  ``use_image_generator`` selects the augmenting
    image-folder path (sagan/dataset.py:139-142)."""
    data_path = config["data_path"]
    config = dict(config)
    global_batch = config.get("global_batch_size", config["batch_size"])
    process_count = config.get("process_count", 1)
    process_index = config.get("process_index", 0)
    per_host = global_batch // process_count

    if config.get("use_image_generator"):
        from .image_folder import ImageFolderDataset
        ds = ImageFolderDataset(
            data_path,
            batch_size=per_host,
            img_size=config["img_size"],
            data_size=config.get("data_size", -1),
            seed=config.get("data_seed", 0),
            process_index=process_index,
            process_count=process_count,
        )
    else:
        ds = ImageDataset(
            data_path,
            batch_size=per_host,
            data_size=config.get("data_size", -1),
            shuffle_buffer=config.get("shuffle_buffer", SHUFFLE_BUFFER),
            seed=config.get("data_seed", 0),
            process_index=process_index,
            process_count=process_count,
            num_workers=config.get("data_workers", 4),
            cache_in_memory=config.get("cache_dataset"),
            verify_crc=config.get("verify_crc", True),
        )
    config.update(ds.meta)
    return ds, config
