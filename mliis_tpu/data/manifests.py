"""Canonical FSS-1000 task-split manifests.

The three task-name lists are dataset metadata shipped with the reference
(/root/reference/data/{fss_test_set,fss_train_set,fp-k_test_set}.txt, loaded
by fss_1000_utils.py:31-60); they are copied verbatim here because split
parity requires the exact same 760/240 partition and FP-k holdout.
"""
import os
import random
from typing import List, Sequence, Tuple

_DIRNAME = os.path.dirname(__file__)

TOTAL_NUM_FSS_CLASSES = 1000
IMAGE_DIMS = 224  # Side length of (square) FSS-1000 images.

# FP-k tasks are unions of synonym classes (metaseg.py:21).
DEFAULT_K_SHOT_SET = [
    {"airliner", "aeroplane"},
    {"bus"},
    {"motorbike"},
    {"potted_plant", "potted plant"},
    {"television", "tvmonitor"},
]


def _read_manifest(name: str) -> List[str]:
    with open(os.path.join(_DIRNAME, name), "r") as f:
        return [line.rstrip("\n") for line in f]


def get_fss_test_set() -> List[str]:
    return _read_manifest("fss_test_set.txt")


def get_fss_train_set() -> List[str]:
    return _read_manifest("fss_train_set.txt")


def get_fp_k_test_set() -> List[str]:
    return _read_manifest("fp-k_test_set.txt")


TEST_TASK_IDS = get_fss_test_set()
TRAIN_TASK_IDS = get_fss_train_set()
FP_K_TEST_TASK_IDS = get_fp_k_test_set()


def assert_train_test_split(train: Sequence[str], test: Sequence[str]) -> None:
    train_set = set(train)
    for t in test:
        assert t not in train_set, "train-test leakage: {}".format(t)


def split_train_test_tasks(all_tasks: Sequence[str], n_test: int,
                           reproducible_splits: bool = False,
                           rng: random.Random = None
                           ) -> Tuple[List[str], List[str]]:
    """Pop `n_test` tasks off the end (after shuffle or sort), like
    fss_1000_utils.split_train_test_tasks."""
    all_tasks = list(all_tasks)
    if reproducible_splits:
        all_tasks = sorted(all_tasks)
    else:
        (rng or random).shuffle(all_tasks)
    test_set = [all_tasks.pop() for _ in range(n_test)]
    assert_train_test_split(all_tasks, test_set)
    return all_tasks, test_set


def partition_by_test_ids(task_names: Sequence[str],
                          test_task_ids: Sequence[str]
                          ) -> Tuple[List[str], List[str]]:
    """Deterministic train/test partition by membership in `test_task_ids`
    (metaseg.py:44-55)."""
    test_ids = set(test_task_ids)
    train, test = [], []
    for name in task_names:
        (test if name in test_ids else train).append(name)
    return train, test
