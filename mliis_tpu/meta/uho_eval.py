"""Early-stopping evaluation + the UHO driver.

`evaluate_with_early_stopping` (reptile.py:296-391): per task, split
support/val, adapt up to max_steps while probing the val set after every
step, early-stop on patience, collect (task, best_steps, best_miou); then
optionally re-evaluate every task at the MEDIAN best step count.

`optimize_update_hyperparams` (eval.py:93-185): drives the GP search over
{lr, drop_rate, aug_rate, inner_batch_size} with the above as the black-box
objective, writes the per-config CSV, and returns (best_lr, median steps).

TPU-native: the per-task probe is the scanned trace kernel from
early_stopping.py, vmapped over task chunks; only the patience walk and the
GP run on the host.
"""
import os
import random as pyrandom
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.data.task_store import TaskStore
from mliis_tpu.meta import episodes, uho
from mliis_tpu.meta.early_stopping import (make_early_stopping_trace_fn,
                                           walk_trace)
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import LossConfig, ModelState, OptimizerConfig


class EarlyStoppingEvaluator:
    """Compiled-on-demand early-stopping evaluation over a TaskStore."""

    def __init__(self, model, loss_config: LossConfig,
                 opt_config: OptimizerConfig, store: TaskStore,
                 num_shots: int = 5, test_shots: int = 5,
                 replacement: bool = False, augment: bool = True,
                 weight_decay_rate: float = 1.0, patience: int = 50,
                 task_chunk_size: int = 4, mesh=None,
                 pallas_augment=None, chain_chunk: bool = False):
        self.model = model
        self.loss_config = loss_config
        self.opt_config = opt_config
        self.store = store
        self.num_shots = num_shots
        self.test_shots = test_shots
        self.replacement = replacement
        self.augment = augment
        self.weight_decay_rate = weight_decay_rate
        self.patience = patience
        self.mesh = mesh
        self.pallas_augment = pallas_augment
        self.chain_chunk = chain_chunk and mesh is None
        if mesh is not None:
            from mliis_tpu.parallel.mesh import TASK_AXIS
            n_dev = mesh.shape[TASK_AXIS]
            task_chunk_size = -(-task_chunk_size // n_dev) * n_dev
        self.task_chunk_size = task_chunk_size
        from mliis_tpu.meta.evaluate import device_store_arrays
        self._images, self._masks, self._counts = device_store_arrays(store)
        self._n_max = store.images.shape[1]
        # Median-step re-eval evaluators, keyed by their EvalConfig: the GP
        # search calls evaluate_with_early_stopping once per sampled config,
        # and rebuilding the (jitted) evaluator per call would recompile the
        # same shapes (the estimated step count repeats across configs).
        self._gecko_cache: Dict[EvalConfig, GeckoEvaluator] = {}
        # Per-instance (NOT functools.lru_cache on the method: that keys a
        # class-level cache by `self`, pinning discarded evaluators and
        # their compiled executables until eviction).
        self._trace_cache: Dict[Tuple[int, int], Callable] = {}

    def _trace_kernel(self, max_steps: int, inner_batch_size: int):
        cached = self._trace_cache.get((max_steps, inner_batch_size))
        if cached is not None:
            return cached
        trace_fn = make_early_stopping_trace_fn(
            self.model, self.loss_config, self.opt_config,
            max_steps=max_steps, inner_batch_size=inner_batch_size,
            replacement=self.replacement, augment=self.augment,
            weight_decay_rate=self.weight_decay_rate,
            support_size=self.num_shots, val_size=self.test_shots,
            pallas_augment=self.pallas_augment)
        total = self.num_shots + self.test_shots

        def per_task(state, task_images, task_masks, count, key, lr,
                     drop_rate, aug_rate):
            k_sample, k_split, k_trace = jax.random.split(key, 3)
            shot_idx = episodes.sample_shot_indices(k_sample, count, total,
                                                    self._n_max)
            support_rel, val_rel = episodes.split_support_query(
                k_split, total, self.test_shots)
            sup = shot_idx[support_rel]
            val = shot_idx[val_rel]
            return trace_fn(state, task_images[sup], task_masks[sup],
                            task_images[val], task_masks[val], k_trace, lr,
                            drop_rate, aug_rate)

        if self.chain_chunk:
            # Sequential tasks inside the program (see EvalConfig.
            # chain_chunk): single-task activation footprint for the
            # max_steps-bounded trace scans at any chunk size.
            def vmapped(state, imgs, msks, cnts, keys, lr, dr, ar):
                return jax.lax.map(
                    lambda xs: per_task(state, xs[0], xs[1], xs[2], xs[3],
                                        lr, dr, ar),
                    (imgs, msks, cnts, keys))
        else:
            vmapped = jax.vmap(per_task,
                               in_axes=(None, 0, 0, 0, 0, None, None, None))
        if self.mesh is not None:
            # Chunk's task dim shards over the mesh "task" axis, like
            # parallel.mesh.make_sharded_eval_chunk.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from mliis_tpu.parallel.mesh import TASK_AXIS
            vmapped = shard_map(
                vmapped, mesh=self.mesh,
                in_specs=(P(), P(TASK_AXIS), P(TASK_AXIS), P(TASK_AXIS),
                          P(TASK_AXIS), P(), P(), P()),
                out_specs=P(TASK_AXIS),
                check_vma=False)
        kernel = jax.jit(vmapped)
        self._trace_cache[(max_steps, inner_batch_size)] = kernel
        return kernel

    def evaluate_with_early_stopping(
            self, state: ModelState, key, min_steps: int, max_steps: int,
            inner_batch_size: int = 8, lr: float = 5e-4,
            drop_rate: Optional[float] = None,
            aug_rate: Optional[float] = 0.5, eval_all_tasks: bool = False,
            num_tasks_to_sample: int = 20,
            eval_tasks_with_median_early_stopping_iterations: bool = False,
            rng: Optional[pyrandom.Random] = None,
            task_indices: Optional[List[int]] = None
            ) -> Tuple[List[str], List[int], List[float]]:
        """Returns (task_names, best num steps per task, IoU scores).

        `task_indices` restricts the run to specific store rows (the k-shot
        learning-curve path probes one task at a time while reusing this
        evaluator's compiled kernels across tasks, meta/kshot.py)."""
        if task_indices is not None:
            indices = list(task_indices)
        else:
            indices = list(range(self.store.num_tasks))
            if not eval_all_tasks:
                (rng or pyrandom).shuffle(indices)
                indices = indices[:num_tasks_to_sample]
        task_names = [self.store.names[i] for i in indices]

        if min_steps != max_steps:
            kernel = self._trace_kernel(max_steps, inner_batch_size)
            if drop_rate is None:  # model-default placeholder semantics
                default = getattr(self.model, "final_layer_dropout_rate", None)
                drop_rate = float(default) if default else 0.0
            drop = jnp.float32(drop_rate)
            aug = None if aug_rate is None else jnp.float32(aug_rate)
            num_steps, ious = [], []
            chunk = self.task_chunk_size
            for start in range(0, len(indices), chunk):
                idx = indices[start:start + chunk]
                pad = chunk - len(idx)
                gather = jnp.asarray(list(idx) + [idx[-1]] * pad)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, chunk)
                traces = kernel(state, self._images[gather],
                                self._masks[gather], self._counts[gather],
                                keys, jnp.float32(lr), drop, aug)
                for trace in np.asarray(traces)[:len(idx)]:
                    steps, best = walk_trace(trace, patience=self.patience,
                                             min_steps=min_steps)
                    num_steps.append(int(steps))
                    ious.append(float(best))
            estimated_best_num_steps = int(np.median(num_steps))
        else:
            estimated_best_num_steps = min_steps
            num_steps = [estimated_best_num_steps] * len(indices)
            ious = []

        if (eval_tasks_with_median_early_stopping_iterations
                or min_steps == max_steps):
            eval_cfg = EvalConfig(
                num_shots=self.num_shots, test_shots=self.test_shots,
                inner_batch_size=inner_batch_size,
                inner_iters=max(estimated_best_num_steps, 1),
                replacement=self.replacement, augment=self.augment,
                weight_decay_rate=self.weight_decay_rate,
                pallas_augment=self.pallas_augment,
                task_chunk_size=self.task_chunk_size,
                chain_chunk=self.chain_chunk)
            evaluator = self._gecko_cache.get(eval_cfg)
            if evaluator is None:
                evaluator = GeckoEvaluator(self.model, self.loss_config,
                                           self.opt_config, eval_cfg,
                                           self.store, mesh=self.mesh)
                self._gecko_cache[eval_cfg] = evaluator
            key, sub = jax.random.split(key)
            per_task = evaluator.evaluate_tasks(state, indices, sub, lr,
                                                drop_rate, aug_rate)
            ious = [float(x) for x in per_task]

        return task_names, list(num_steps), list(ious)


def optimize_update_hyperparams(
        es_evaluator: EarlyStoppingEvaluator, state: ModelState, key,
        min_steps: int = 0, max_steps: int = 80,
        num_configs_to_sample: int = 100,
        num_train_val_data_splits_to_sample_per_config: int = 1,
        lr_search_range_low: float = 0.0005, lr_search_range_high: float = 0.05,
        drop_rate_search_range_low: float = 0.2,
        drop_rate_search_range_high: float = 0.2,
        aug_rate_search_range_low: float = 0.5,
        aug_rate_search_range_high: float = 0.5,
        batch_size_search_range_low: int = 8,
        batch_size_search_range_high: int = 8,
        serially_eval_all_tasks: bool = True, num_tasks_to_sample: int = 20,
        eval_tasks_with_median_early_stopping_iterations: bool = False,
        save_dir: Optional[str] = None,
        results_csv_name: str = "GP_val-set_hyper_param_search_results.csv",
        num_shots: int = 5, estimator: str = "GP",
        log_fn=print) -> Tuple[float, int]:
    """GP search over update hyperparams; returns (best_lr, best step num)."""
    assert estimator in uho.SUPPORTED_SEARCH_ALGS

    key_holder = {"key": key}

    def eval_fn(lr=None, drop_rate=None, aug_rate=None, inner_batch_size=8,
                **_):
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        return es_evaluator.evaluate_with_early_stopping(
            state, sub, min_steps=min_steps, max_steps=max_steps,
            inner_batch_size=int(inner_batch_size),
            lr=lr if lr is not None else 5e-4,
            drop_rate=drop_rate, aug_rate=aug_rate,
            eval_all_tasks=serially_eval_all_tasks,
            num_tasks_to_sample=num_tasks_to_sample,
            eval_tasks_with_median_early_stopping_iterations=(
                eval_tasks_with_median_early_stopping_iterations))

    before_ext, ext = os.path.splitext(results_csv_name)
    results_csv_name = "{}_{}-shot{}".format(before_ext, num_shots, ext)
    save_results_to = os.path.join(save_dir, results_csv_name) \
        if save_dir is not None else results_csv_name

    params = {uho.LEARNING_RATE_NAME: None, uho.DROPOUT_RATE_NAME: None,
              uho.AUG_RATE_NAME: 0.5, uho.BATCH_SIZE_NAME: 8}
    best_lr, expected_best_step_num = \
        uho.lr_droprate_aug_rate_batch_size_gp_search(
            eval_fn, params,
            lr_search_range_low=lr_search_range_low,
            lr_search_range_high=lr_search_range_high,
            drop_rate_search_range_low=drop_rate_search_range_low,
            drop_rate_search_range_high=drop_rate_search_range_high,
            aug_rate_search_range_low=aug_rate_search_range_low,
            aug_rate_search_range_high=aug_rate_search_range_high,
            batch_size_search_range_low=batch_size_search_range_low,
            batch_size_search_range_high=batch_size_search_range_high,
            n=num_configs_to_sample,
            m=num_train_val_data_splits_to_sample_per_config,
            save_results_to=save_results_to, log_fn=log_fn)
    return best_lr, expected_best_step_num
