"""Device-resident episodic task store.

The TPU-native replacement for the reference's per-task tf.data iterators
(metaseg.py:181-230, one reinitializable iterator shared across 1000
BinarySegmentationTask objects, one `sess.run` round-trip per sample): all
tasks are stacked into uint8 arrays that live in HBM, and episode assembly
becomes a traceable gather. FSS-1000 is 1000 tasks x ~10 examples x 224^2 x 3
uint8 ~ 1.5 GB — it fits on-chip, and per-episode slices are tiny.
"""
import dataclasses
import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mliis_tpu.data import manifests
from mliis_tpu.data import tfrecord

SHARD_SUFFIXES = (".tfrecord.gzip", ".tfrecord", ".npz")


@dataclasses.dataclass
class TaskStore:
    """A set of binary-segmentation tasks with aligned padded storage.

    images: [T, N_max, H, W, 3] uint8
    masks:  [T, N_max, H, W] uint8 with foreground encoded as 255
            (the tfrecord encoding; one-hot [bg, fg] conversion happens
            on-device at episode assembly, matching input_fn.py:62-63)
    counts: [T] int32 — number of valid examples per task
    names:  task names (shard basenames, e.g. "bus.tfrecord.gzip")
    """
    images: np.ndarray
    masks: np.ndarray
    counts: np.ndarray
    names: List[str]

    def __post_init__(self):
        assert self.images.ndim == 5 and self.images.dtype == np.uint8
        assert self.masks.ndim == 4 and self.masks.dtype == np.uint8
        assert len(self.names) == self.images.shape[0] == len(self.counts)

    @property
    def num_tasks(self) -> int:
        return self.images.shape[0]

    @property
    def image_size(self) -> int:
        return self.images.shape[2]

    def subset(self, indices: Sequence[int]) -> "TaskStore":
        idx = np.asarray(indices, dtype=np.int64)
        return TaskStore(self.images[idx], self.masks[idx], self.counts[idx],
                         [self.names[i] for i in idx])

    def subset_by_names(self, names: Sequence[str]) -> "TaskStore":
        name_to_idx = {n: i for i, n in enumerate(self.names)}
        return self.subset([name_to_idx[n] for n in names])

    def save_npz(self, path: str) -> None:
        np.savez_compressed(path, images=self.images, masks=self.masks,
                            counts=self.counts, names=np.array(self.names))

    @staticmethod
    def load_npz(path: str) -> "TaskStore":
        with np.load(path, allow_pickle=False) as z:
            return TaskStore(z["images"], z["masks"], z["counts"],
                             [str(n) for n in z["names"]])

    @staticmethod
    def from_task_arrays(tasks: Sequence[Tuple[np.ndarray, np.ndarray]],
                         names: Sequence[str],
                         max_examples: Optional[int] = None) -> "TaskStore":
        """Stack per-task (images [n,H,W,3], masks [n,H,W]) into padded arrays."""
        counts = np.array([t[0].shape[0] for t in tasks], np.int32)
        n_max = int(max_examples or counts.max())
        h, w = tasks[0][0].shape[1:3]
        images = np.zeros((len(tasks), n_max, h, w, 3), np.uint8)
        masks = np.zeros((len(tasks), n_max, h, w), np.uint8)
        for i, (img, msk) in enumerate(tasks):
            n = min(img.shape[0], n_max)
            images[i, :n] = img[:n]
            masks[i, :n] = msk[:n]
            counts[i] = n
        return TaskStore(images, masks, counts, list(names))


def task_name_from_path(path: str) -> str:
    name = os.path.basename(path)
    for suffix in SHARD_SUFFIXES:
        if name.endswith(suffix):
            return name[: -len(suffix)]
    return name


def find_task_shards(data_dir: str) -> List[str]:
    """All shard files in a directory (tfrecord or npz), sorted by name."""
    paths = []
    for pattern in ("*.tfrecord*", "*.npz"):
        paths.extend(glob.glob(os.path.join(data_dir, pattern)))
    return sorted(set(paths))


def load_task_store(data_dir: str, image_size: int = 224,
                    max_examples: Optional[int] = None,
                    num_threads: int = 8) -> TaskStore:
    """Load every per-task shard in `data_dir` into one TaskStore.

    tfrecord shards go through the native C++ parallel loader when built
    (native/tfrecord_loader.cc), falling back to the Python codec.
    """
    shard_paths = find_task_shards(data_dir)
    if not shard_paths:
        raise FileNotFoundError(
            "No task shards (*.tfrecord*, *.npz) in {}".format(data_dir))

    tf_paths = [p for p in shard_paths if not p.endswith(".npz")]
    npz_paths = [p for p in shard_paths if p.endswith(".npz")]

    tasks, names = [], []
    if tf_paths:
        from mliis_tpu.data import native_loader
        if max_examples is None:
            # Parallel count probe: ctypes releases the GIL during the
            # foreign call (and the Python-codec fallback is IO-bound), so
            # a thread pool turns the 1000-shard gunzip-and-count pass from
            # serial into ~num_threads-wide — it would otherwise roughly
            # double dataset-ingest wall-clock on top of read_shards.
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(num_threads) as pool:
                probe_max = max(pool.map(native_loader.count_examples,
                                         tf_paths))
        else:
            probe_max = max_examples
        images, masks, counts = native_loader.read_shards(
            tf_paths, image_size, probe_max, num_threads=num_threads)
        for i, path in enumerate(tf_paths):
            c = int(counts[i])
            tasks.append((images[i, :c], masks[i, :c]))
            names.append(task_name_from_path(path))
    for path in npz_paths:
        with np.load(path, allow_pickle=False) as z:
            tasks.append((z["images"], z["masks"]))
        names.append(task_name_from_path(path))

    # Skip empty shards (zero records): a zero-count task row would
    # otherwise flow into episode sampling and train on padded zeros.
    kept = [i for i, t in enumerate(tasks) if t[0].shape[0] > 0]
    if len(kept) < len(tasks):
        dropped = [names[i] for i in range(len(tasks)) if i not in set(kept)]
        print("load_task_store: skipping {} empty shard(s): {}".format(
            len(dropped), dropped[:5]))
        tasks = [tasks[i] for i in kept]
        names = [names[i] for i in kept]
    if not tasks:
        raise ValueError("All task shards in {} are empty".format(data_dir))

    order = np.argsort(names)
    tasks = [tasks[i] for i in order]
    names = [names[i] for i in order]
    return TaskStore.from_task_arrays(tasks, names, max_examples)


def split_fss_1000(store: TaskStore, num_val_tasks: int = 0,
                   test_task_ids: Optional[Sequence[str]] = None,
                   seed: int = 0
                   ) -> Tuple[TaskStore, Optional[TaskStore], TaskStore]:
    """Deterministic FSS-1000 train/val/test split (metaseg.py:24-121).

    Test tasks are selected by membership in `test_task_ids` (defaults to the
    canonical 240-task manifest); val tasks are then popped off the sorted
    remainder (split_train_test_tasks with reproducible_splits=True).
    """
    if test_task_ids is None:
        test_task_ids = manifests.TEST_TASK_IDS
    train_names, test_names = manifests.partition_by_test_ids(
        store.names, test_task_ids)
    train_names, val_names = manifests.split_train_test_tasks(
        train_names, num_val_tasks, reproducible_splits=True)
    train = store.subset_by_names(train_names)
    val = store.subset_by_names(val_names) if val_names else None
    test = store.subset_by_names(test_names)
    return train, val, test


def image_hashes(store: TaskStore) -> set:
    """sha-256 of every valid image's bytes (hash_np_array equivalent,
    fss_1000_utils semantics used by metaseg.py:305-310)."""
    import hashlib
    out = set()
    for t in range(store.num_tasks):
        for i in range(int(store.counts[t])):
            out.add(hashlib.sha256(store.images[t, i].tobytes()).hexdigest())
    return out


def assert_train_test_split(train: Optional[TaskStore],
                            test: TaskStore,
                            check_image_hashes: bool = False) -> None:
    """Train/test leakage invariants.

    Task-name disjointness always (assert_train_test_split,
    fss_1000_utils.py:22-24); with check_image_hashes, sha-256 image-level
    disjointness too (metaseg.py:305-310 — the reference computes it
    per-episode behind the test_train_test_split flag; at store granularity
    it is strictly stronger and runs once)."""
    if train is None:
        return
    overlap = set(train.names) & set(test.names)
    assert not overlap, \
        "train/test task names overlap: {}".format(sorted(overlap)[:5])
    if check_image_hashes:
        leaked = image_hashes(train) & image_hashes(test)
        assert not leaked, \
            "{} identical images appear in both train and test".format(
                len(leaked))


def validate_datasets(train: Optional[TaskStore], val: Optional[TaskStore],
                      test: TaskStore, pretrained: bool = False,
                      run_k_shot_experiment: bool = False,
                      eval_val_tasks: bool = False) -> None:
    """Dataset sanity checks (utils/util.py:124-130)."""
    if not pretrained and not run_k_shot_experiment:
        assert train is not None and train.num_tasks > 0, \
            "Training set must have examples."
    assert test.num_tasks > 0, "Test set must have examples."
    if eval_val_tasks and val is not None and val.num_tasks == 0:
        raise ValueError("Val set has no tasks to evaluate")


def union_tasks_by_synonyms(store: TaskStore,
                            synonym_sets=None) -> TaskStore:
    """Build FP-k tasks as unions of synonym classes (metaseg.py:124-178)."""
    if synonym_sets is None:
        synonym_sets = manifests.DEFAULT_K_SHOT_SET
    tasks, names = [], []
    for synonyms in synonym_sets:
        primary = None
        member_idx = []
        for i, synonym in enumerate(sorted(synonyms)):
            synonym = synonym.replace(" ", "")
            if primary is None:
                primary = synonym
            member_idx.extend(j for j, n in enumerate(store.names)
                              if synonym in n)
        member_idx = sorted(set(member_idx))
        if not member_idx:
            continue
        images = np.concatenate([store.images[j, :store.counts[j]]
                                 for j in member_idx])
        masks = np.concatenate([store.masks[j, :store.counts[j]]
                                for j in member_idx])
        tasks.append((images, masks))
        names.append(primary)
    return TaskStore.from_task_arrays(tasks, names)
