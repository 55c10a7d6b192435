"""K-shot learning-curve experiments (FP-k benchmark).

Reference: `run_k_shot_learning_curves_experiment` (eval.py:190-243) and
`Gecko.evaluate_k_shot_range` / `evaluate_m_k_shot_ranges_all_tasks`
(reptile.py:393-441): for each FP-k task (synonym unions of FSS-1000 +
PASCAL-5i classes) and each k in {1,5,10,50,100,200,400}, adapt on k
support examples (for k >= 10, first estimate the step count by early
stopping on an 80/20 split of the support set, capped at 500 steps) and
measure mIoU on 20 held-out query images; append (k, mIoU) rows to
k-shot-results.csv.

Compile economics: one compiled kernel serves every (task, repetition) that
shares an episode shape. Evaluators are built over the FULL task store and
cached by shape key — (num_shots, test_shots, inner_iters, inner_batch) for
the adaptation kernel, (num_shots, test_shots) for the early-stopping trace
— so the 7-point k-range x tasks x m-reps protocol costs at most one
45-70 s remote compile per distinct shape instead of one per loop iteration
(a per-iteration `jax.jit` was rebuilding kernels for every task).
"""
import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mliis_tpu.data.task_store import TaskStore
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import LossConfig, ModelState, OptimizerConfig
from mliis_tpu.meta.uho_eval import EarlyStoppingEvaluator

DEFAULT_K_RANGE = [1, 5, 10, 50, 100, 200, 400]
DEFAULT_ITER_RANGE = [1, 5, 10, 25, 50, 100, 200]


class EvaluatorCache:
    """Shape-keyed evaluator cache shared across the k-shot loops.

    `constructions` counts evaluator builds (== distinct compiled-kernel
    shapes); tests assert it stays constant as tasks x reps grow.
    """

    def __init__(self, model, loss_config: LossConfig,
                 opt_config: OptimizerConfig, store: TaskStore,
                 pallas_augment=None):
        self.model = model
        self.loss_config = loss_config
        self.opt_config = opt_config
        self.store = store
        self.pallas_augment = pallas_augment
        self._gecko: Dict[EvalConfig, GeckoEvaluator] = {}
        self._es: Dict[Tuple[int, int], EarlyStoppingEvaluator] = {}
        self.constructions = 0

    def gecko(self, config: EvalConfig) -> GeckoEvaluator:
        ev = self._gecko.get(config)
        if ev is None:
            ev = GeckoEvaluator(self.model, self.loss_config,
                                self.opt_config, config, self.store)
            self._gecko[config] = ev
            self.constructions += 1
        return ev

    def early_stopping(self, num_shots: int,
                       test_shots: int) -> EarlyStoppingEvaluator:
        key = (num_shots, test_shots)
        ev = self._es.get(key)
        if ev is None:
            ev = EarlyStoppingEvaluator(
                self.model, self.loss_config, self.opt_config, self.store,
                num_shots=num_shots, test_shots=test_shots, augment=True,
                task_chunk_size=1, pallas_augment=self.pallas_augment)
            self._es[key] = ev
            self.constructions += 1
        return ev


def evaluate_k_shot_range(model, loss_config: LossConfig,
                          opt_config: OptimizerConfig, state: ModelState,
                          task_store: TaskStore, task_index: int, key,
                          k_range: Sequence[int] = DEFAULT_K_RANGE,
                          iter_range: Sequence[int] = DEFAULT_ITER_RANGE,
                          test_samples: int = 20,
                          inner_batch_size: int = 8, lr: float = 5e-4,
                          aug_rate: float = 0.5,
                          eval_inner_iters: int = 5,
                          early_stopping_min_val_samples: int = 5,
                          estimate_inner_iters_with_early_stopping: bool = True,
                          max_es_steps: int = 500,
                          cache: Optional[EvaluatorCache] = None,
                          pallas_augment=None,
                          log_fn=print) -> List[float]:
    """mIoU for one task across the k-range."""
    if cache is None:
        cache = EvaluatorCache(model, loss_config, opt_config, task_store,
                               pallas_augment=pallas_augment)
    count = int(task_store.counts[task_index])
    test_samples = min(test_samples, max(count - 1, 1))
    mious = []
    for i, k in enumerate(k_range):
        k_eff = min(k, max(count - test_samples, 1))
        # With estimation ON the reference keeps the caller's fixed
        # inner_iters (eval.py:196 eval_inner_iters, default 5) for ks below
        # the early-stopping gate; iter_range only applies when estimation
        # is OFF (reptile.py:423-434).
        if estimate_inner_iters_with_early_stopping:
            inner_iters = eval_inner_iters
        else:
            inner_iters = (iter_range[i] if i < len(iter_range)
                           else iter_range[-1])
        if (estimate_inner_iters_with_early_stopping
                and k_eff >= early_stopping_min_val_samples * 2):
            val_shots = int(0.2 * k_eff)
            es = cache.early_stopping(num_shots=k_eff - val_shots,
                                      test_shots=val_shots)
            key, sub = jax.random.split(key)
            _, steps, _ = es.evaluate_with_early_stopping(
                state, sub, min_steps=1, max_steps=max_es_steps,
                inner_batch_size=inner_batch_size, lr=lr, aug_rate=aug_rate,
                task_indices=[task_index])
            inner_iters = max(int(np.median(steps)), 1)
            log_fn("{}-shot: early stopping chose {} steps".format(
                k, inner_iters))
        eval_cfg = EvalConfig(num_shots=k_eff, test_shots=test_samples,
                              inner_batch_size=min(inner_batch_size, k_eff),
                              inner_iters=inner_iters, transductive=True,
                              augment=True,
                              pallas_augment=cache.pallas_augment,
                              task_chunk_size=1)
        evaluator = cache.gecko(eval_cfg)
        key, sub = jax.random.split(key)
        per_task = evaluator.evaluate_tasks(state, [task_index], sub, lr,
                                            aug_rate=aug_rate)
        mious.append(float(per_task[0]))
        log_fn("{}-shot mIoU: {}".format(k, mious[-1]))
    return mious


def run_k_shot_learning_curves_experiment(
        model, loss_config: LossConfig, opt_config: OptimizerConfig,
        state: ModelState, dataset: TaskStore, key,
        num_samples: int = 1, k_range: Sequence[int] = DEFAULT_K_RANGE,
        iter_range: Optional[Sequence[int]] = None,
        eval_inner_batch_size: int = 8, eval_inner_iters: int = 5,
        lr: float = 5e-4,
        aug_rate: float = 0.5, test_samples: int = 20,
        csv_outpath: Optional[str] = "k-shot-results.csv",
        cache: Optional[EvaluatorCache] = None,
        pallas_augment=None,
        log_fn=print) -> Tuple[List[int], List[float]]:
    """m repetitions x tasks x k-range; returns (ks, mIoUs) and appends CSV."""
    if iter_range is None:
        iter_range = DEFAULT_ITER_RANGE
    if cache is None:
        cache = EvaluatorCache(model, loss_config, opt_config, dataset,
                               pallas_augment=pallas_augment)
    ks: List[int] = []
    results: List[float] = []
    for task_index in range(dataset.num_tasks):
        for _ in range(num_samples):
            key, sub = jax.random.split(key)
            res = evaluate_k_shot_range(
                model, loss_config, opt_config, state, dataset, task_index,
                sub, k_range=k_range, iter_range=iter_range,
                test_samples=test_samples,
                inner_batch_size=eval_inner_batch_size,
                eval_inner_iters=eval_inner_iters, lr=lr,
                aug_rate=aug_rate, cache=cache, log_fn=log_fn)
            log_fn("k-shot results {}".format(dict(zip(k_range, res))))
            results.extend(res)
            ks.extend(k_range)

    if csv_outpath is not None:
        exists = os.path.isfile(csv_outpath)
        with open(csv_outpath, "a" if exists else "w", newline="") as f:
            writer = csv.writer(f)
            if not exists:
                writer.writerow(["k", "mIoU"])
            for k, miou in zip(ks, results):
                writer.writerow([k, miou])
    return ks, results
