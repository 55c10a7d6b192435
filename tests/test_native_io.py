"""Native C++ shard IO: writer/loader round-trips against the pure-Python
codec, including TFRecord masked-CRC correctness (the reference's TF readers
verify CRCs; the Python reader here skips them, so the frames are checked
explicitly)."""
import os
import struct

import gzip
import numpy as np
import pytest

from mliis_tpu.data import native_loader, tfrecord

pytestmark = pytest.mark.skipif(
    not native_loader.native_loader_available(),
    reason="native library not built (make -C native)")


def _random_task(rng, n=5, w=16):
    images = rng.integers(0, 256, (n, w, w, 3)).astype(np.uint8)
    masks = (rng.random((n, w, w)) > 0.5).astype(np.uint8) * 255
    return images, masks


def test_native_write_python_read(tmp_path, rng):
    images, masks = _random_task(rng)
    path = str(tmp_path / "task.tfrecord.gzip")
    assert native_loader.native_writer_available()
    native_loader.write_shard(path, images, masks)
    out_i, out_m = tfrecord.read_segmentation_shard(path, 16)
    np.testing.assert_array_equal(out_i, images)
    np.testing.assert_array_equal(out_m, masks)


def test_python_write_native_read(tmp_path, rng):
    images, masks = _random_task(rng)
    path = str(tmp_path / "task.tfrecord.gzip")
    tfrecord.write_segmentation_shard(path, images, masks)
    assert native_loader.count_examples(path) == 5
    out_i, out_m, counts = native_loader.read_shards([path], 16, 5)
    np.testing.assert_array_equal(out_i[0], images)
    np.testing.assert_array_equal(out_m[0], masks)
    assert counts[0] == 5


def test_native_frames_carry_valid_masked_crcs(tmp_path, rng):
    """Frame-level check: length and payload CRCs must match the Python
    codec's masked CRC32C (what TF's record reader verifies)."""
    images, masks = _random_task(rng, n=2)
    path = str(tmp_path / "task.tfrecord.gzip")
    native_loader.write_shard(path, images, masks)
    with gzip.open(path, "rb") as f:
        data = f.read()
    pos, n_records = 0, 0
    while pos < len(data):
        length_bytes = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (len_crc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        assert len_crc == tfrecord._masked_crc(length_bytes)
        payload = data[pos + 12:pos + 12 + length]
        (data_crc,) = struct.unpack(
            "<I", data[pos + 12 + length:pos + 16 + length])
        assert data_crc == tfrecord._masked_crc(payload)
        pos += 16 + length
        n_records += 1
    assert n_records == 2


def test_native_record_bytes_match_python_codec(tmp_path, rng):
    """The C++ Example encoder must produce byte-identical records to the
    Python encode_example (same field order and wire layout)."""
    images, masks = _random_task(rng, n=3)
    native_path = str(tmp_path / "native.tfrecord.gzip")
    python_path = str(tmp_path / "python.tfrecord.gzip")
    native_loader.write_shard(native_path, images, masks)
    tfrecord.write_segmentation_shard(python_path, images, masks)
    a = tfrecord.read_tfrecord_file(native_path)
    b = tfrecord.read_tfrecord_file(python_path)
    assert len(a) == len(b) == 3
    for ra, rb in zip(a, b):
        assert ra == rb


def test_parallel_write_shards_and_store_load(tmp_path, rng):
    flat_images, flat_masks, offsets, counts, paths = [], [], [], [], []
    off = 0
    for name in ("ant", "bee", "cow"):
        images, masks = _random_task(rng, n=4)
        flat_images.append(images)
        flat_masks.append(masks)
        offsets.append(off)
        counts.append(4)
        off += 4
        paths.append(str(tmp_path / "{}.tfrecord.gzip".format(name)))
    native_loader.write_shards(paths, np.concatenate(flat_images),
                               np.concatenate(flat_masks),
                               np.asarray(offsets), np.asarray(counts))
    from mliis_tpu.data.task_store import load_task_store
    store = load_task_store(str(tmp_path), image_size=16)
    assert store.num_tasks == 3 and store.names == ["ant", "bee", "cow"]
    np.testing.assert_array_equal(store.images[0, :4], flat_images[0])


def test_convert_uses_native_writer(tmp_path, rng):
    """convert_fss_1000 writes through the native path; output loads back."""
    from PIL import Image
    from mliis_tpu.data.convert import convert_fss_1000
    root = tmp_path / "fss"
    for cls in ("bus",):
        d = root / cls
        os.makedirs(str(d))
        for i in range(1, 3):
            img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
            msk = (rng.random((16, 16)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(img).save(str(d / "{}.jpg".format(i)))
            Image.fromarray(msk).save(str(d / "{}.png".format(i)))
    out = tmp_path / "shards"
    written = convert_fss_1000(str(root), str(out), image_dims=16,
                               num_workers=1)
    assert len(written) == 1
    images, masks = tfrecord.read_segmentation_shard(written[0], 16)
    assert images.shape[0] == 2


def test_corrupt_length_field_errors_instead_of_oob(tmp_path):
    """A record whose 8-byte length decodes near UINT64_MAX must fail the
    framing check (error -3 -> IOError) — an unchecked `pos + length + 4`
    would wrap around size_t and read out of bounds."""
    path = str(tmp_path / "corrupt.tfrecord.gzip")
    frame = struct.pack("<QI", 0xFFFFFFFFFFFFFFF0, 0) + b"\x00" * 16
    with gzip.open(path, "wb") as f:
        f.write(frame)
    with pytest.raises(IOError):
        native_loader.count_examples(path)
    with pytest.raises(IOError):
        native_loader.read_shards([path], 16, 4, num_threads=1)


def test_zero_record_shard_counts_zero_both_paths(tmp_path):
    """An empty (zero-record) gzip shard loads as count 0 through BOTH the
    native loader and the pure-Python fallback codec."""
    path = str(tmp_path / "empty.tfrecord.gzip")
    with gzip.open(path, "wb") as f:
        f.write(b"")
    assert native_loader.count_examples(path) == 0
    _, _, counts = native_loader.read_shards([path], 16, 4, num_threads=1)
    assert int(counts[0]) == 0
    imgs, msks = tfrecord.read_segmentation_shard(path, 16)
    assert imgs.shape == (0, 16, 16, 3) and msks.shape == (0, 16, 16)


def test_load_task_store_skips_empty_shards(tmp_path, rng):
    """A zero-record shard in the directory is skipped with a notice (a
    zero-count task row would otherwise feed padded zeros into episode
    sampling); an all-empty directory raises."""
    from mliis_tpu.data.task_store import load_task_store
    images, masks = _random_task(rng)
    native_loader.write_shard(str(tmp_path / "cat.tfrecord.gzip"),
                              images, masks)
    with gzip.open(str(tmp_path / "dog.tfrecord.gzip"), "wb") as f:
        f.write(b"")
    store = load_task_store(str(tmp_path), image_size=16)
    assert store.names == ["cat"] and store.num_tasks == 1
    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    with gzip.open(str(empty_dir / "a.tfrecord.gzip"), "wb") as f:
        f.write(b"")
    with pytest.raises(ValueError, match="empty"):
        load_task_store(str(empty_dir), image_size=16)
