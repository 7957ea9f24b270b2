"""ctypes bindings for the native C++ TFRecord reader.

Builds ``libsagan_tfrecord.so`` on first use (g++, no external deps) and
caches the handle; every entry point degrades gracefully — importers fall
back to the pure-Python codec when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsagan_tfrecord.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise ImportError("native reader build failed previously")
        src = os.path.join(_DIR, "tfrecord_reader.cc")
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _DIR, "libsagan_tfrecord.so"],
                    check=True, capture_output=True, timeout=120)
            except Exception as e:  # no compiler / build error
                _build_failed = True
                raise ImportError(f"native reader build failed: {e}") from e
        lib = ctypes.CDLL(_SO)
        lib.sagan_reader_open.restype = ctypes.c_void_p
        lib.sagan_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.sagan_reader_next.restype = ctypes.c_int64
        lib.sagan_reader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.sagan_reader_close.argtypes = [ctypes.c_void_p]
        lib.sagan_reader_error.restype = ctypes.c_char_p
        lib.sagan_reader_error.argtypes = [ctypes.c_void_p]
        lib.sagan_crc32c.restype = ctypes.c_uint32
        lib.sagan_crc32c.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def crc32c(data: bytes) -> int:
    lib = _load()
    return int(lib.sagan_crc32c(data, len(data)))


def native_read_image_examples(
        path: str, img_size: int, chunk: int = 1024,
        verify: bool = False) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Stream (images [K,S,S,3] uint8, labels [K] int64) chunks from a
    TFRecord file, decoded entirely in C++."""
    lib = _load()
    img_bytes = img_size * img_size * 3
    h = lib.sagan_reader_open(path.encode(), int(verify))
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        while True:
            imgs = np.empty((chunk, img_size, img_size, 3), np.uint8)
            labels = np.empty((chunk,), np.int64)
            n = lib.sagan_reader_next(
                h, imgs.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p), chunk, img_bytes)
            if n < 0:
                raise IOError(
                    f"{path}: {lib.sagan_reader_error(h).decode()}")
            if n == 0:
                return
            yield imgs[:n], labels[:n]
            if n < chunk:
                return
    finally:
        lib.sagan_reader_close(h)
