"""ctypes bindings for the native C++ shard loader (native/tfrecord_loader.cc).

Loads reference-format gzip TFRecord shards with a C++ thread pool —
replacing the reference's pathological startup behavior of opening a TF
session per shard just to count examples (utils/util.py:24-32, invoked once
per task at dataset build, metaseg.py:69). Falls back transparently to the
pure-Python codec when the shared library hasn't been built.

Build: `make -C native` (zlib + pthreads; no Python dev headers needed).
"""
import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libtfrecord_loader.so"),
    os.path.join(os.path.dirname(__file__), "libtfrecord_loader.so"),
]

_lib = None
_lib_checked = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.tl_count_examples.argtypes = [ctypes.c_char_p]
            lib.tl_count_examples.restype = ctypes.c_int
            lib.tl_read_shard.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64]
            lib.tl_read_shard.restype = ctypes.c_int
            lib.tl_read_shards_parallel.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            lib.tl_read_shards_parallel.restype = ctypes.c_int
            if hasattr(lib, "tl_write_shard"):
                lib.tl_write_shard.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64]
                lib.tl_write_shard.restype = ctypes.c_int
                lib.tl_write_shards_parallel.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int]
                lib.tl_write_shards_parallel.restype = ctypes.c_int
            _lib = lib
            break
    return _lib


def native_loader_available() -> bool:
    return _load_library() is not None


def count_examples(path: str) -> int:
    lib = _load_library()
    if lib is None:
        from mliis_tpu.data import tfrecord
        return tfrecord.count_examples_in_tfrecords([path])
    count = lib.tl_count_examples(path.encode())
    if count < 0:
        raise IOError("native loader failed on {} (code {})".format(
            path, count))
    return count


def read_shards(paths: List[str], image_size: int, max_examples: int,
                num_threads: int = 8
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read many shards into padded arrays.

    Returns (images [S, max_examples, W, W, 3] u8,
             masks [S, max_examples, W, W] u8, counts [S] i32).
    """
    lib = _load_library()
    n = len(paths)
    image_bytes = image_size * image_size * 3
    mask_bytes = image_size * image_size
    images = np.zeros((n, max_examples, image_size, image_size, 3), np.uint8)
    masks = np.zeros((n, max_examples, image_size, image_size), np.uint8)
    counts = np.zeros((n,), np.int32)

    if lib is None:
        from mliis_tpu.data import tfrecord
        for i, path in enumerate(paths):
            imgs, msks = tfrecord.read_segmentation_shard(path, image_size)
            c = min(imgs.shape[0], max_examples)
            images[i, :c] = imgs[:c]
            masks[i, :c] = msks[:c]
            counts[i] = c
        return images, masks, counts

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.tl_read_shards_parallel(
        c_paths, n,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_examples, image_bytes, mask_bytes, num_threads)
    if ok != n:
        bad = [(paths[i], int(counts[i])) for i in range(n) if counts[i] < 0]
        raise IOError("native loader failed on {} shards: {}".format(
            n - ok, bad[:5]))
    return images, masks, counts


def native_writer_available() -> bool:
    lib = _load_library()
    return lib is not None and hasattr(lib, "tl_write_shard")


def write_shard(path: str, images: np.ndarray, masks: np.ndarray) -> None:
    """Write one gzip TFRecord shard (reference format) via the C++ writer;
    falls back to the pure-Python codec when the library lacks it."""
    if not native_writer_available():
        from mliis_tpu.data import tfrecord
        tfrecord.write_segmentation_shard(path, images, masks)
        return
    lib = _load_library()
    images = np.ascontiguousarray(images, np.uint8)
    masks = np.ascontiguousarray(masks, np.uint8)
    n = images.shape[0]
    image_bytes = int(np.prod(images.shape[1:]))
    mask_bytes = int(np.prod(masks.shape[1:]))
    rc = lib.tl_write_shard(
        path.encode(),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, image_bytes, mask_bytes)
    if rc != n:
        raise IOError("native writer failed on {} (code {})".format(path, rc))


def write_shards(paths: List[str], images: np.ndarray, masks: np.ndarray,
                 offsets: np.ndarray, counts: np.ndarray,
                 num_threads: int = 8) -> None:
    """Write many shards from one flat example store in parallel.

    images/masks: [N_total, ...] u8; shard i covers
    [offsets[i], offsets[i]+counts[i])."""
    if not native_writer_available():
        from mliis_tpu.data import tfrecord
        for i, path in enumerate(paths):
            lo = int(offsets[i])
            hi = lo + int(counts[i])
            tfrecord.write_segmentation_shard(path, images[lo:hi],
                                              masks[lo:hi])
        return
    lib = _load_library()
    images = np.ascontiguousarray(images, np.uint8)
    masks = np.ascontiguousarray(masks, np.uint8)
    n = len(paths)
    image_bytes = int(np.prod(images.shape[1:]))
    mask_bytes = int(np.prod(masks.shape[1:]))
    offsets64 = np.ascontiguousarray(offsets, np.int64)
    counts32 = np.ascontiguousarray(counts, np.int32)
    results = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.tl_write_shards_parallel(
        c_paths, n,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        image_bytes, mask_bytes,
        results.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    if ok != n:
        bad = [(paths[i], int(results[i])) for i in range(n)
               if results[i] < 0]
        raise IOError("native writer failed on {} shards: {}".format(
            n - ok, bad[:5]))
