"""Early stopping: patience-based stopper + trace-based adaptation probe.

The reference's `_early_stopping_learn` (reptile.py:443-480) evaluates the
full val set after EVERY inner SGD step and stops when the per-step val mIoU
fails to improve for `patience` steps. TPU-natively the whole probe is one
scanned program producing the [max_steps] mIoU trace (bounded, max_steps <=
500), and the EarlyStopper patience walk runs on the host trace — identical
best-step/best-metric results to stopping live, without ping-ponging
device<->host per step.

EarlyStopper itself is a direct behavioral port of
meta_learners/hyperparam_search.py:24-68.
"""
import dataclasses
import operator
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.meta import episodes
from mliis_tpu.meta.inner_loop import (LossConfig, ModelState,
                                       OptimizerConfig, sgd_scan_step)
from mliis_tpu.ops.metrics import batched_hard_iou


class EarlyStopper:
    """Computes the stopping criterion given a metric and a patience."""

    def __init__(self, patience: int = 10, metric_should_increase: bool = True,
                 min_steps: int = 0):
        self.patience = patience
        self.metric_should_increase = metric_should_increase
        self.eval_operator = operator.gt if metric_should_increase \
            else operator.lt
        self._best_metric = None
        self._best_num_steps = min_steps if min_steps > 0 else None
        self.num_evals_without_improving = 0
        self.min_steps = min_steps

    def continue_training(self, metric, total_steps_taken) -> bool:
        if total_steps_taken <= self.min_steps:
            self._best_metric = metric
            return True
        elif (self._best_metric is None
              or self.eval_operator(metric, self._best_metric)):
            self.num_evals_without_improving = 0
            self._best_metric = metric
            self._best_num_steps = total_steps_taken
        else:
            self.num_evals_without_improving += 1
            if self.num_evals_without_improving > self.patience:
                return False
        return True

    def best_metric(self):
        return self._best_metric

    def best_num_steps(self):
        return self._best_num_steps


def walk_trace(trace, patience: int = 50, min_steps: int = 0
               ) -> Tuple[int, float]:
    """Apply EarlyStopper to a per-step metric trace; returns
    (best_num_steps, best_metric) — exactly what live stopping would find."""
    stopper = EarlyStopper(patience=patience, min_steps=min_steps)
    for step, metric in enumerate(np.asarray(trace)):
        if not stopper.continue_training(float(metric), step + 1):
            break
    return stopper.best_num_steps(), stopper.best_metric()


def make_early_stopping_trace_fn(model, loss_config: LossConfig,
                                 opt_config: OptimizerConfig, *,
                                 max_steps: int, inner_batch_size: int,
                                 replacement: bool = False,
                                 augment: bool = True,
                                 weight_decay_rate: float = 1.0,
                                 support_size: int, val_size: int,
                                 precompute_augment: bool = False,
                                 pallas_augment=None):
    """Build trace(state, support u8, val u8, key, lr, drop_rate, aug_rate)
    -> [max_steps] val mIoU after each inner step.

    With precompute_augment, all step batches are augmented in one vmapped
    bf16 pre-pass; since the rotation-once composition the in-scan default
    is faster and compiles smaller (see MetaTrainConfig.precompute_augment).
    """
    from mliis_tpu.meta.inner_loop import make_loss_and_grad, apply_optimizer
    from mliis_tpu.ops import meta_math
    step_fn = sgd_scan_step(model, loss_config, opt_config,
                            weight_decay_rate=weight_decay_rate,
                            pallas_augment=pallas_augment)
    loss_and_grad = make_loss_and_grad(model, loss_config)

    def trace_fn(state: ModelState, support_images_u8, support_masks_u8,
                 val_images_u8, val_masks_u8, key, lr, drop_rate, aug_rate):
        k_batches, k_steps = jax.random.split(key)
        idx_matrix = episodes.batch_indices(
            k_batches, support_size, inner_batch_size, max_steps, replacement)
        keys = jax.random.split(k_steps, max_steps)
        lrs = jnp.full((max_steps,), lr, jnp.float32)
        val_images = val_images_u8.astype(jnp.float32)
        val_masks = episodes.onehot_mask(val_masks_u8)

        def probe(new_state):
            _, probs = model.apply(
                {"params": new_state.params,
                 "batch_stats": new_state.batch_stats},
                val_images, train=False)
            preds = (probs > 0.5).astype(jnp.float32)
            return jnp.nanmean(batched_hard_iou(preds, val_masks))

        if precompute_augment and augment:
            from mliis_tpu.meta.inner_loop import precompute_augmented_batches
            all_images, all_masks, drop_keys = precompute_augmented_batches(
                support_images_u8, support_masks_u8, idx_matrix, keys,
                aug_rate)

            def step_and_probe(carry, xs):
                images, masks, k_drop, step_lr = xs
                params = carry.params
                if weight_decay_rate != 1.0:
                    params = meta_math.tree_weight_decay(params,
                                                         weight_decay_rate)
                (_, new_bn), grads = loss_and_grad(
                    params, carry.batch_stats, images.astype(jnp.float32),
                    masks.astype(jnp.float32), k_drop, drop_rate)
                new_params, new_opt = apply_optimizer(params, grads,
                                                      carry.opt, step_lr,
                                                      opt_config)
                new_state = ModelState(new_params, new_bn, new_opt)
                return new_state, probe(new_state)

            _, miou_trace = jax.lax.scan(
                step_and_probe, state, (all_images, all_masks, drop_keys, lrs))
            return miou_trace

        def step_and_probe(carry, xs):
            new_state, loss = step_fn(
                carry, xs, support_images_u8=support_images_u8,
                support_masks_u8=support_masks_u8, drop_rate=drop_rate,
                aug_rate=aug_rate, augment=augment)
            return new_state, probe(new_state)

        _, miou_trace = jax.lax.scan(step_and_probe, state,
                                     (idx_matrix, keys, lrs))
        return miou_trace

    return trace_fn
