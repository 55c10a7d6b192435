"""Meta-training loop driver (the train_gecko equivalent, train.py:18-135).

Orchestration stays on the host (checkpointing, eval intervals, annealing,
deadlines); each meta-step is one donated jitted XLA program from
meta/learners.py. The linear meta-step anneal, periodic train/test eval with
IoU scalars, best-seen checkpointing, periodic checkpoints with
max_to_keep=2, and time-deadline early exit all mirror the reference.
"""
import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.data.task_store import TaskStore
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import LossConfig, ModelState, OptimizerConfig
from mliis_tpu.meta.learners import (MetaTrainConfig,
                                     make_chained_train_step,
                                     make_microbatched_train_step,
                                     make_train_step,
                                     meta_step_size_schedule)
from mliis_tpu.utils import checkpoint as ckpt_lib
from mliis_tpu.utils.logging import MetricsWriter, log_estimated_time_remaining
from mliis_tpu.utils.profiling import PhaseTimer


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    meta_iters: int = 50000
    meta_step_size: float = 0.1
    meta_step_size_final: float = 0.1
    eval_interval: int = 10
    eval_inner_batch_size: int = 8
    eval_inner_iters: int = 59
    num_eval_shots: int = 5
    num_tasks_to_eval: int = 100
    save_checkpoint_every_n_meta_iters: int = 100
    max_checkpoints_to_keep: int = 2
    save_best_seen: bool = False
    time_deadline: Optional[float] = None
    lr: float = 5e-4
    transductive: bool = False
    aug_rate: Optional[float] = None
    # When set, process the meta-batch in task groups of this size per
    # device launch (host linear combine) — needed when the full meta-batch
    # exceeds one chip's HBM (2 fits a 16 GB v5e at 224px bf16).
    task_group_size: Optional[int] = None
    # When > 0, shard the meta-batch (and eval chunks) over this many devices
    # along a "task" mesh axis (parallel/mesh.py). Takes precedence over
    # task_group_size: sharding already divides per-chip HBM pressure by the
    # mesh size.
    mesh_tasks: int = 0
    # When > 1 (with mesh_tasks), meta-train on a 2D (task, data) mesh of
    # mesh_tasks x mesh_data devices: each task row splits every inner-loop
    # batch over the data axis with sync-BN and exact axis-aware gradients
    # (inner_loop.DataShardSpec). The training model is swapped for a
    # bn_axis_name="data" copy; eval-interval evaluators keep the plain
    # model and shard over all mesh_tasks*mesh_data devices' task axis.
    mesh_data: int = 0
    # Run the meta-batch sequentially INSIDE one compiled launch (lax.scan
    # over task slots, learners.make_chained_train_step): the single-task
    # activation footprint of task_group_size=1 without its per-group launch
    # gaps. Composes with mesh_tasks: each device then chains its LOCAL task
    # slots (lax.map) instead of vmapping them — relevant when meta_batch
    # exceeds the mesh size.
    chain_tasks: bool = False
    # Same strategy for the eval-interval evaluators' chunks (lax.map).
    chain_eval_chunk: bool = False


def train_gecko(model, state: ModelState, train_store: TaskStore,
                test_store: TaskStore, save_dir: str,
                loss_config: LossConfig, opt_config: OptimizerConfig,
                meta_config: MetaTrainConfig, loop_config: TrainLoopConfig,
                key, log_fn: Callable = print,
                eval_task_chunk_size: int = 8) -> ModelState:
    """Run meta-training; returns the final ModelState."""
    os.makedirs(save_dir, exist_ok=True)
    cfg = loop_config

    if cfg.mesh_data and cfg.mesh_data > 1 and not cfg.mesh_tasks:
        raise ValueError(
            "mesh_data > 1 requires mesh_tasks (the 2D mesh is "
            "mesh_tasks x mesh_data; use mesh_tasks=1 for pure data "
            "parallelism) — refusing to silently train unsharded")
    mesh = train_mesh = None
    if cfg.mesh_tasks:
        from mliis_tpu.parallel.mesh import (DATA_AXIS,
                                             make_sharded_train_step,
                                             make_task_data_mesh,
                                             make_task_mesh)
        train_model = model
        if cfg.mesh_data and cfg.mesh_data > 1:
            # 2D (task, data) mesh: the training model gets sync-BN over the
            # data axis (same params/variables tree — bn_axis_name only
            # changes moment reduction), the evaluators keep `model` and a
            # task-only mesh over all devices.
            train_mesh = make_task_data_mesh(cfg.mesh_tasks, cfg.mesh_data)
            train_model = dataclasses.replace(model,
                                              bn_axis_name=DATA_AXIS)
            mesh = make_task_mesh(cfg.mesh_tasks * cfg.mesh_data)
        else:
            train_mesh = mesh = make_task_mesh(cfg.mesh_tasks)
        train_step = make_sharded_train_step(
            train_model, loss_config, opt_config, meta_config,
            n_max=train_store.images.shape[1], mesh=train_mesh,
            chain_local=cfg.chain_tasks)
    elif cfg.chain_tasks:
        train_step = jax.jit(
            make_chained_train_step(model, loss_config, opt_config,
                                    meta_config,
                                    n_max=train_store.images.shape[1]),
            donate_argnums=(0,))
    elif cfg.task_group_size:
        train_step = make_microbatched_train_step(
            model, loss_config, opt_config, meta_config,
            n_max=train_store.images.shape[1],
            group_size=cfg.task_group_size)
    else:
        train_step = jax.jit(
            make_train_step(model, loss_config, opt_config, meta_config,
                            n_max=train_store.images.shape[1]),
            donate_argnums=(0,))

    # The interval evaluators inherit the training run's inner-loop
    # protocol (reference train.py threads replacement + the scheduler into
    # its eval calls) and its augmentation engine selection, so eval IoUs —
    # which drive best-seen checkpointing — match the configured protocol.
    eval_cfg = EvalConfig(
        num_shots=cfg.num_eval_shots,
        inner_batch_size=cfg.eval_inner_batch_size,
        inner_iters=cfg.eval_inner_iters,
        replacement=meta_config.replacement,
        transductive=cfg.transductive,
        augment=meta_config.augment,
        precompute_augment=meta_config.precompute_augment,
        pallas_augment=meta_config.pallas_augment,
        lr_scheduler=meta_config.lr_scheduler,
        lr_decay_rate=meta_config.lr_decay_rate,
        lr_decay_after_n_steps=meta_config.lr_decay_after_n_steps,
        weight_decay_rate=meta_config.weight_decay_rate,
        task_chunk_size=eval_task_chunk_size,
        chain_chunk=cfg.chain_eval_chunk)
    evaluators = {
        "train": GeckoEvaluator(model, loss_config, opt_config, eval_cfg,
                                train_store, mesh=mesh),
        "test": GeckoEvaluator(model, loss_config, opt_config, eval_cfg,
                               test_store, mesh=mesh),
    }
    writers = {split: MetricsWriter(save_dir, split)
               for split in ("train", "test")}

    from mliis_tpu.meta.evaluate import device_store_arrays
    store_images, store_masks, store_counts = device_store_arrays(train_store)
    if mesh is not None:
        from mliis_tpu.parallel.mesh import replicate_to_mesh
        # Replicate over the TRAINING mesh (2D when mesh_data is set; it
        # spans the same device set as the eval task mesh, and a fully
        # replicated layout is valid input for both programs).
        store_images, store_masks, store_counts = replicate_to_mesh(
            (store_images, store_masks, store_counts), train_mesh)
        state = replicate_to_mesh(
            jax.tree_util.tree_map(jnp.array, state), train_mesh)

    best_eval_iou = -np.inf
    best_save_dir = os.path.join(save_dir, "best_eval")
    timer = PhaseTimer()

    for i in range(cfg.meta_iters):
        begin_time = time.time()
        cur_meta_step_size = meta_step_size_schedule(
            i, cfg.meta_iters, cfg.meta_step_size, cfg.meta_step_size_final)
        key, step_key = jax.random.split(key)
        with timer.phase("meta_step"):
            state = train_step(state, store_images, store_masks, store_counts,
                               step_key, jnp.float32(cur_meta_step_size),
                               jnp.float32(cfg.lr))
            # Attribute real device time, not async dispatch (a meta-step is
            # seconds of device work; the sync costs microseconds).
            jax.block_until_ready(state.params)

        if i % cfg.eval_interval == 0:
            mean_ious = []
            for split in ("train", "test"):
                key, eval_key = jax.random.split(key)
                with timer.phase("eval_" + split):
                    mean_iou, _ = evaluators[split].evaluate(
                        state, eval_key, lr=cfg.lr, eval_all_tasks=False,
                        num_tasks_to_sample=cfg.num_tasks_to_eval,
                        aug_rate=cfg.aug_rate)
                writers[split].scalar("IoU", mean_iou, i)
                writers[split].scalar("meta_step_size", cur_meta_step_size, i)
                mean_ious.append(mean_iou)
            log_fn("Train step %d: train=%f test=%f"
                   % (i, mean_ious[0], mean_ious[1]))

            if cfg.save_best_seen and mean_ious[1] > best_eval_iou:
                best_eval_iou = mean_ious[1]
                log_fn("Highest test-set evaluation IoU seen at step {}: {}"
                       .format(i, best_eval_iou))
                ckpt_lib.save_checkpoint(best_save_dir, state, i,
                                         max_to_keep=1,
                                         metadata={"best_iou": best_eval_iou})

        if (i % cfg.save_checkpoint_every_n_meta_iters == 0
                or i == cfg.meta_iters - 1):
            ckpt_lib.save_checkpoint(save_dir, state, i,
                                     max_to_keep=cfg.max_checkpoints_to_keep)
        if cfg.time_deadline is not None and time.time() > cfg.time_deadline:
            log_fn("Time deadline reached at step {}".format(i))
            break
        # Printed every meta-step like the reference (train.py:134,
        # util.py:94-98).
        log_estimated_time_remaining(begin_time, i, cfg.meta_iters,
                                     log_fn=log_fn)

    for w in writers.values():
        w.close()
    timer.dump(os.path.join(save_dir, "phase_timings.jsonl"), log_fn=log_fn)
    return state
