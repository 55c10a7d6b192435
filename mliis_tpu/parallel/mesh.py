"""Device-mesh parallelism: task-axis sharding for meta-training and eval.

The domain's natural parallel axis is the TASK (SURVEY.md §2.2): the
reference serializes its meta-batch of 5 adaptations and its 240-task eval
sweep in a host loop; here both shard across a `jax.sharding.Mesh` axis
named "task" via `shard_map`, with XLA collectives (pmean) combining the
outer update. Sync-BN across a `data` axis is available through the models'
`bn_axis_name` (see models/layers.py).

Design:
  - the task store is replicated (FSS-1000 is ~2 GB uint8 — cheap at 16 GB
    HBM/chip) so episode gathers stay local;
  - each device adapts `ceil(meta_batch/D)` tasks via vmap; padded slots get
    zero weight and the cross-device weighted pmean reproduces the exact
    m-task average of the single-device path;
  - eval chunks shard their task dimension across the mesh: a 240-task sweep
    on 8 chips is 30 sequential task-launches per chip.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mliis_tpu.meta import episodes
from mliis_tpu.meta.evaluate import EvalConfig, make_eval_task_fn
from mliis_tpu.meta.inner_loop import (LossConfig, ModelState,
                                       OptimizerConfig, make_adapt_fn)
from mliis_tpu.meta.learners import MetaTrainConfig
from mliis_tpu.ops import meta_math

TASK_AXIS = "task"


def make_task_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (TASK_AXIS,))


def make_sharded_train_step(model, loss_config: LossConfig,
                            opt_config: OptimizerConfig,
                            config: MetaTrainConfig, n_max: int, mesh: Mesh):
    """Meta-train step with the meta-batch sharded over the task axis.

    Semantics match learners.make_*_train_step exactly (same weighted
    averages over exactly meta_batch_size tasks); FOMAML support includes
    the tail-shot split.
    """
    num_devices = mesh.shape[TASK_AXIS]
    m = config.meta_batch_size
    local_n = -(-m // num_devices)  # ceil
    adapt = make_adapt_fn(model, loss_config, opt_config,
                          weight_decay_rate=config.weight_decay_rate,
                          augment=config.augment,
                          precompute_augment=config.precompute_augment)
    adapt_raw = make_adapt_fn(model, loss_config, opt_config,
                              weight_decay_rate=config.weight_decay_rate,
                              augment=False)
    tail = config.tail_shots
    # Gecko does not forward aug_rate (defaults to the 6/7 gate); FOMLIS does.
    aug_rate = config.aug_rate if config.foml else None

    def per_task(state, task_images_u8, task_masks_u8, count, key, lr):
        k_shots, k_split, k_batches, k_steps, k_tail = jax.random.split(key, 5)
        shot_idx = episodes.sample_shot_indices(k_shots, count,
                                                config.num_shots, n_max)
        support_images = task_images_u8[shot_idx]
        support_masks = task_masks_u8[shot_idx]
        if config.foml and tail is not None:
            train_shots = config.num_shots - tail
            if config.sample_train_val_with_replacement:
                train_rel, tail_rel = episodes.split_with_replacement(
                    k_split, config.num_shots, train_shots, tail)
            else:
                train_rel, tail_rel = episodes.split_support_query(
                    k_split, config.num_shots, tail)
            idx_matrix = episodes.batch_indices(
                k_batches, train_shots, config.inner_batch_size,
                config.inner_iters - 1, config.replacement)
            keys = jax.random.split(k_steps, config.inner_iters - 1)
            lrs = jnp.full((config.inner_iters - 1,), lr, jnp.float32)
            pre_tail, _ = adapt(state, support_images[train_rel],
                                support_masks[train_rel], idx_matrix, keys,
                                lrs, aug_rate=aug_rate)
            tail_idx = jnp.arange(tail)[None, :]
            final, _ = adapt_raw(pre_tail, support_images[tail_rel],
                                 support_masks[tail_rel], tail_idx,
                                 k_tail[None],
                                 jnp.full((1,), lr, jnp.float32))
            update = meta_math.tree_sub(final.params, pre_tail.params)
        else:
            idx_matrix = episodes.batch_indices(
                k_batches, config.num_shots, config.inner_batch_size,
                config.inner_iters, config.replacement)
            keys = jax.random.split(k_steps, config.inner_iters)
            lrs = jnp.full((config.inner_iters,), lr, jnp.float32)
            if config.foml:
                pre_tail, _ = adapt(state, support_images, support_masks,
                                    idx_matrix[:-1], keys[:-1], lrs[:-1],
                                    aug_rate=aug_rate)
                final, _ = adapt(pre_tail, support_images, support_masks,
                                 idx_matrix[-1:], keys[-1:], lrs[-1:],
                                 aug_rate=aug_rate)
                update = meta_math.tree_sub(final.params, pre_tail.params)
            else:
                final, _ = adapt(state, support_images, support_masks,
                                 idx_matrix, keys, lrs, aug_rate=aug_rate)
                update = final.params  # Reptile averages adapted params
        return update, final

    def shard_fn(state, store_images, store_masks, counts, key,
                 meta_step_size, lr):
        dev = jax.lax.axis_index(TASK_AXIS)
        num_tasks = store_images.shape[0]
        k_tasks, k_inner = jax.random.split(key)
        # Deterministic global sampling: device d draws global slots
        # [d*local_n, (d+1)*local_n); slots >= m carry zero weight.
        global_slots = dev * local_n + jnp.arange(local_n)
        slot_keys = jax.vmap(
            lambda s: jax.random.fold_in(k_tasks, s))(global_slots)
        task_ids = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, num_tasks))(slot_keys)
        inner_keys = jax.vmap(
            lambda s: jax.random.fold_in(k_inner, s))(global_slots)
        weights = (global_slots < m).astype(jnp.float32)

        updates, finals = jax.vmap(
            per_task, in_axes=(None, 0, 0, 0, 0, None)
        )(state, store_images[task_ids], store_masks[task_ids],
          counts[task_ids], inner_keys, lr)

        def wmean(tree):
            # Global mean over exactly the m real tasks: sum(w*x)/m locally
            # then psum — safe when a device holds only padded slots.
            def f(x):
                w = weights.reshape(weights.shape + (1,) * (x.ndim - 1))
                return jax.lax.psum(jnp.sum(x * w, axis=0) / m, TASK_AXIS)
            return jax.tree_util.tree_map(f, tree)

        mean_update = wmean(updates)
        if config.foml:
            new_params = meta_math.tree_add(
                state.params, meta_math.tree_scale(mean_update,
                                                   meta_step_size))
        else:
            new_params = meta_math.tree_interpolate(
                state.params, mean_update, meta_step_size)
        new_bn = wmean(finals.batch_stats)
        new_opt_v = wmean(finals.opt.v)
        new_opt = state.opt._replace(
            v=new_opt_v, step=finals.opt.step[0])
        return ModelState(new_params, new_bn, new_opt)

    from jax import shard_map
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_eval_chunk(model, loss_config: LossConfig,
                            opt_config: OptimizerConfig, config: EvalConfig,
                            n_max: int, mesh: Mesh):
    """Vmapped+sharded task-chunk eval: the chunk's task dim splits across
    the mesh. chunk size must be a multiple of the mesh size."""
    num_devices = mesh.shape[TASK_AXIS]
    assert config.task_chunk_size % num_devices == 0, \
        "task_chunk_size must be a multiple of the task-mesh size"
    eval_task = make_eval_task_fn(model, loss_config, opt_config, config,
                                  n_max)
    vmapped = jax.vmap(eval_task, in_axes=(None, 0, 0, 0, 0, None, None, None))

    from jax import shard_map
    sharded = shard_map(
        vmapped, mesh=mesh,
        in_specs=(P(), P(TASK_AXIS), P(TASK_AXIS), P(TASK_AXIS),
                  P(TASK_AXIS), P(), P(), P()),
        out_specs=P(TASK_AXIS),
        check_vma=False)
    return jax.jit(sharded)


def replicate_to_mesh(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
