"""Data-layer tests: tfrecord codec round-trip, task store, splits,
manifests, FP-k synonym unions."""
import os

import numpy as np
import pytest

from mliis_tpu.data import manifests, tfrecord
from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.data.task_store import (TaskStore, assert_train_test_split,
                                       load_task_store, split_fss_1000,
                                       task_name_from_path,
                                       union_tasks_by_synonyms,
                                       validate_datasets)


def test_manifest_sizes():
    assert len(manifests.TEST_TASK_IDS) == 239 + 1 or \
        len(manifests.TEST_TASK_IDS) == 239  # file may lack trailing newline
    assert len(manifests.TRAIN_TASK_IDS) >= 758
    assert len(manifests.FP_K_TEST_TASK_IDS) >= 4
    # train/test manifests are disjoint
    manifests.assert_train_test_split(manifests.TRAIN_TASK_IDS,
                                      manifests.TEST_TASK_IDS)


def test_partition_by_test_ids():
    names = ["a", "b", "c", "d"]
    train, test = manifests.partition_by_test_ids(names, ["b", "d"])
    assert train == ["a", "c"] and test == ["b", "d"]


def test_split_train_test_tasks_reproducible():
    tasks = ["t{}".format(i) for i in range(10)]
    train1, test1 = manifests.split_train_test_tasks(tasks, 3,
                                                     reproducible_splits=True)
    train2, test2 = manifests.split_train_test_tasks(list(reversed(tasks)), 3,
                                                     reproducible_splits=True)
    assert test1 == test2  # sorted before popping -> order-independent
    assert len(train1) == 7 and len(test1) == 3


def test_tfrecord_roundtrip(tmp_path, rng):
    images = rng.integers(0, 256, (5, 16, 16, 3)).astype(np.uint8)
    masks = (rng.random((5, 16, 16)) > 0.5).astype(np.uint8) * 255
    path = str(tmp_path / "task.tfrecord.gzip")
    tfrecord.write_segmentation_shard(path, images, masks)
    out_images, out_masks = tfrecord.read_segmentation_shard(path, 16)
    np.testing.assert_array_equal(out_images, images)
    np.testing.assert_array_equal(out_masks, masks)
    assert tfrecord.count_examples_in_tfrecords([path]) == 5


def test_example_codec_multifeature(rng):
    payload = {"image": b"\x01\x02\x03", "mask": b"\xff" * 10}
    buf = tfrecord.encode_example(payload)
    decoded = tfrecord.decode_example(buf)
    assert decoded["image"] == [payload["image"]]
    assert decoded["mask"] == [payload["mask"]]


def test_crc32c_known_value():
    # Standard CRC32C test vector: "123456789" -> 0xE3069283
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_task_store_roundtrip(tmp_path):
    store = make_synthetic_store(num_tasks=4, examples_per_task=6,
                                 image_size=16)
    path = str(tmp_path / "store.npz")
    store.save_npz(path)
    loaded = TaskStore.load_npz(path)
    np.testing.assert_array_equal(loaded.images, store.images)
    np.testing.assert_array_equal(loaded.masks, store.masks)
    assert loaded.names == store.names


def test_load_task_store_from_tfrecord_dir(tmp_path, rng):
    for name in ("bus", "cat"):
        images = rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
        masks = (rng.random((3, 16, 16)) > 0.5).astype(np.uint8) * 255
        tfrecord.write_segmentation_shard(
            str(tmp_path / "{}.tfrecord.gzip".format(name)), images, masks)
    store = load_task_store(str(tmp_path), image_size=16)
    assert store.num_tasks == 2
    assert store.names == ["bus", "cat"]
    assert store.counts.tolist() == [3, 3]


def test_task_name_from_path():
    assert task_name_from_path("/x/bus.tfrecord.gzip") == "bus"
    assert task_name_from_path("/x/cat.npz") == "cat"


def test_split_fss_1000_uses_manifest():
    # Build a store whose names straddle the canonical test manifest.
    test_names = manifests.TEST_TASK_IDS[:3]
    train_names = manifests.TRAIN_TASK_IDS[:5]
    all_names = list(train_names) + list(test_names)
    n = len(all_names)
    store = TaskStore(
        images=np.zeros((n, 2, 8, 8, 3), np.uint8),
        masks=np.zeros((n, 2, 8, 8), np.uint8),
        counts=np.full((n,), 2, np.int32),
        names=all_names)
    train, val, test = split_fss_1000(store, num_val_tasks=2)
    assert sorted(test.names) == sorted(test_names)
    assert val is not None and val.num_tasks == 2
    assert train.num_tasks == 3
    assert not set(train.names) & set(test.names)


def test_union_tasks_by_synonyms():
    store = make_synthetic_store(num_tasks=4, examples_per_task=4,
                                 image_size=16)
    # synthetic names look like synthetic_rect_0000 etc.
    unions = union_tasks_by_synonyms(store, [{"rect"}, {"ellipse"}])
    assert unions.num_tasks == 2
    # two rect tasks (ids 0 and 3) with 4 examples each -> 8 total
    rect_count = sum(1 for n in store.names if "rect" in n) * 4
    assert unions.counts[0] == rect_count


def test_synthetic_store_learnable_structure():
    store = make_synthetic_store(num_tasks=3, examples_per_task=5,
                                 image_size=32, seed=1)
    assert store.images.shape == (3, 5, 32, 32, 3)
    assert store.masks.dtype == np.uint8
    # every example has nonempty foreground and background
    fg_frac = (store.masks > 0).mean(axis=(2, 3))
    assert (fg_frac > 0.01).all() and (fg_frac < 0.9).all()


def test_assert_train_test_split_detects_leaks():
    store = make_synthetic_store(num_tasks=4, examples_per_task=4,
                                 image_size=16, seed=2)
    train = store.subset([0, 1])
    test = store.subset([2, 3])
    assert_train_test_split(train, test, check_image_hashes=True)  # clean

    # Name-level leak.
    with pytest.raises(AssertionError, match="task names overlap"):
        assert_train_test_split(train, store.subset([1, 2]))

    # Image-level leak under distinct names: copy a train image into test.
    leaked = TaskStore(test.images.copy(), test.masks.copy(),
                       test.counts.copy(), list(test.names))
    leaked.images[0, 0] = train.images[0, 0]
    assert_train_test_split(train, leaked)  # name check alone passes
    with pytest.raises(AssertionError, match="identical images"):
        assert_train_test_split(train, leaked, check_image_hashes=True)


def test_validate_datasets():
    store = make_synthetic_store(num_tasks=2, examples_per_task=4,
                                 image_size=16)
    validate_datasets(store, None, store)
    with pytest.raises(AssertionError, match="Training set"):
        validate_datasets(None, None, store)
    validate_datasets(None, None, store, pretrained=True)
    with pytest.raises(ValueError, match="no tasks"):
        validate_datasets(store, store.subset([]), store,
                          eval_val_tasks=True)
