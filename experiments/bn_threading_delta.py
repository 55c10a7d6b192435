"""Parity-risk experiment: sequential vs meta-batch-averaged BN/opt state.

The reference threads BatchNorm moving statistics and Adam slot variables
SEQUENTIALLY through the tasks of a meta-batch (each task's adaptation
starts from the previous task's running stats, reptile.py:102-125: only
trainable variables are snapshot/restored between tasks), while this
framework's vmapped meta-step adapts every task from the SAME state and
AVERAGES the resulting batch_stats / Adam-v across the meta-batch
(meta/learners.py _mean_state_over_tasks). This script quantifies the
meta-training-dynamics delta between the two on synthetic tasks (CPU-sized),
producing eval-IoU trajectories for docs/BN_THREADING_DELTA.md.

Run: python experiments/bn_threading_delta.py [--meta_iters 300]
"""
import argparse
import json

import jax
# CPU experiment; jax may auto-initialize the axon TPU platform in this
# environment, and env vars are too late (CLAUDE.md).
jax.config.update("jax_platforms", "cpu")
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta import episodes
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import (LossConfig, ModelState,
                                       OptimizerConfig, init_model_state,
                                       make_adapt_fn)
from mliis_tpu.meta.learners import MetaTrainConfig, make_train_step
from mliis_tpu.ops import meta_math


class TinySeg(nn.Module):
    """Small conv-BN segmentation net with the EfficientLab call signature
    (mirrors tests/tiny_model.py, inlined so the experiment runs from the
    installed package)."""
    n_output_channels: int = 2
    features: int = 8

    @nn.compact
    def __call__(self, images, train: bool = True,
                 final_layer_dropout_rate=None):
        from mliis_tpu.models import layers
        from mliis_tpu.ops.resize import resize_bilinear_align_corners
        x = images / 255.0
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), use_bias=False,
                    kernel_init=layers.conv_kernel_init, name="conv0")(x)
        x = layers.batch_norm(x, train, name="batch_normalization")
        x = layers.swish(x)
        x = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=layers.conv_kernel_init, name="conv1")(x)
        x = layers.batch_norm(x, train, name="batch_normalization_1")
        x = layers.swish(x)
        x = nn.Conv(self.n_output_channels, (1, 1), use_bias=True,
                    name="final_layer_weights")(x)
        logits = resize_bilinear_align_corners(
            x, images.shape[-3], images.shape[-2])
        return logits, jax.nn.softmax(logits, axis=-1)


def make_sequential_train_step(model, loss_config, opt_config,
                               config: MetaTrainConfig, n_max: int):
    """Reference-style meta-step: tasks adapt one after another; BN moving
    stats and opt state thread from task to task (only params reset to
    theta), mirroring reptile.py:102-125 where _model_state covers trainable
    variables only."""
    adapt = make_adapt_fn(model, loss_config, opt_config,
                          weight_decay_rate=config.weight_decay_rate,
                          augment=config.augment)
    single = jax.jit(lambda st, im, mk, ct, ky, lr: _one(adapt, config, n_max,
                                                         st, im, mk, ct, ky,
                                                         lr))

    def _one(adapt_fn, cfg, nm, state, imgs, msks, count, key, lr):
        k_shots, k_batches, k_steps = jax.random.split(key, 3)
        shot_idx = episodes.sample_shot_indices(k_shots, count,
                                                cfg.num_shots, nm)
        idx_matrix = episodes.batch_indices(
            k_batches, cfg.num_shots, cfg.inner_batch_size, cfg.inner_iters,
            cfg.replacement)
        keys = jax.random.split(k_steps, cfg.inner_iters)
        lrs = jnp.full((cfg.inner_iters,), lr, jnp.float32)
        adapted, _ = adapt_fn(state, imgs[shot_idx], msks[shot_idx],
                              idx_matrix, keys, lrs, aug_rate=None)
        return adapted

    def train_step(state: ModelState, store_images, store_masks, counts, key,
                   meta_step_size, lr) -> ModelState:
        k_tasks, k_inner = jax.random.split(key)
        num_tasks = store_images.shape[0]
        task_ids = np.asarray(episodes.slot_task_ids(
            k_tasks, num_tasks, config.meta_batch_size))
        task_keys = episodes.slot_keys(k_inner, config.meta_batch_size)
        new_params = []
        bn, opt = state.batch_stats, state.opt
        for j, t in enumerate(task_ids):
            # Params reset to theta; BN/opt thread through sequentially.
            task_state = ModelState(state.params, bn, opt)
            adapted = single(task_state, store_images[t], store_masks[t],
                             counts[t], task_keys[j], jnp.float32(lr))
            new_params.append(adapted.params)
            bn, opt = adapted.batch_stats, adapted.opt
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *new_params)
        mean_params = meta_math.tree_mean_over_axis(stacked)
        theta = meta_math.tree_interpolate(state.params, mean_params,
                                           meta_step_size)
        return ModelState(theta, bn, opt)

    return train_step


def run(tag, train_step, state, store, test_store, model, loss_cfg, opt_cfg,
        meta_iters, eval_every, lr, meta_step, key):
    eval_cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                          inner_iters=8, augment=False, task_chunk_size=4)
    evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg, test_store)
    imgs, msks, cnts = (jnp.asarray(store.images), jnp.asarray(store.masks),
                        jnp.asarray(store.counts))
    curve = []
    for i in range(meta_iters):
        key, k_step = jax.random.split(key)
        state = train_step(state, imgs, msks, cnts, k_step,
                           jnp.float32(meta_step), jnp.float32(lr))
        if i % eval_every == 0 or i == meta_iters - 1:
            key, k_eval = jax.random.split(key)
            iou, _ = evaluator.evaluate(state, k_eval, lr=lr,
                                        eval_all_tasks=True, aug_rate=None)
            curve.append((i, float(iou)))
            print("{} iter {}: eval IoU {:.4f}".format(tag, i, iou),
                  flush=True)
    return curve


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_iters", type=int, default=300)
    parser.add_argument("--eval_every", type=int, default=25)
    parser.add_argument("--opt", default="adam")
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--out", default="experiments/bn_threading_delta.json")
    args = parser.parse_args()

    store = make_synthetic_store(num_tasks=12, examples_per_task=10,
                                 image_size=16, seed=0)
    test_store = make_synthetic_store(num_tasks=6, examples_per_task=10,
                                      image_size=16, seed=99)
    model = TinySeg()  # noqa: F821 - defined above
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name=args.opt)
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=4, inner_iters=6,
                          meta_batch_size=4, foml=False, augment=False)

    results = {}
    for tag, maker in (("vmapped_averaged",
                        lambda: jax.jit(make_train_step(
                            model, loss_cfg, opt_cfg, cfg, n_max=10))),
                       ("sequential_threaded",
                        lambda: make_sequential_train_step(
                            model, loss_cfg, opt_cfg, cfg, n_max=10))):
        state = init_model_state(model, jax.random.PRNGKey(0), 16, opt_cfg)
        results[tag] = run(tag, maker(), state, store, test_store, model,
                           loss_cfg, opt_cfg, args.meta_iters,
                           args.eval_every, lr=0.01, meta_step=0.2,
                           key=jax.random.PRNGKey(args.seed))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    final = {k: v[-1][1] for k, v in results.items()}
    print(json.dumps({"final_eval_iou": final}))


if __name__ == "__main__":
    main()
