"""Reptile and FOMAML/FOMAML* meta-learners as fused, vmapped meta-steps.

Reference semantics (reptile.py):
  - Gecko (Reptile) train_step (:64-125): snapshot trainable params; for each
    of meta_batch tasks, sample num_shots examples and run inner_iters SGD
    steps; average adapted params; theta <- theta + eps*(mean - theta).
    Only *trainable* params are snapshotted/restored — BN moving stats and
    optimizer slots evolve continuously across tasks (never reset during
    meta-training).
  - FOMLIS (FOMAML) train_step (:605-663): the update is the displacement of
    the LAST inner step only (theta_after - theta_before_last_batch),
    averaged over tasks and scaled by the meta step. With tail_shots
    ("FOMAML*"), the support set is split into train/tail; inner_iters - 1
    augmented batches are drawn from train and the final step runs on the
    raw (un-augmented) tail batch.
  - Gecko meta-training augments at the Augmenter default gate (~6/7), since
    train_step never forwards aug_rate into _mini_batches; FOMLIS forwards
    self.aug_rate (run.sh: 0.5).

TPU-native design: the meta-batch is vmapped — tasks adapt concurrently on
one chip (or shard across a mesh `task` axis). The sequential BN-stat /
optimizer-slot threading across tasks becomes an average across the
meta-batch, the parallel equivalent of the same information flow.
"""
import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from mliis_tpu.meta import episodes
from mliis_tpu.meta.inner_loop import (LossConfig, ModelState,
                                       OptimizerConfig, make_adapt_fn,
                                       make_lr_array)
from mliis_tpu.ops import meta_math

Pytree = Any


@dataclasses.dataclass(frozen=True)
class MetaTrainConfig:
    num_shots: int = 10              # train_shots
    inner_batch_size: int = 8
    inner_iters: int = 59
    replacement: bool = False
    meta_batch_size: int = 5
    foml: bool = False
    tail_shots: Optional[int] = None  # FOMAML* when set
    sample_train_val_with_replacement: bool = False
    augment: bool = True
    aug_rate: Optional[float] = None  # None -> Augmenter default gate (6/7)
    weight_decay_rate: float = 1.0
    # In-scan augmentation: after the rotation-once composition
    # (ops/augment.py) the scan-body augmentation is both faster (no
    # HBM-staged 59x8 batch materialization) and cheaper to compile than
    # the precompute pre-pass — measured 0.98 s vs 1.35 s per 2-task
    # 59-step adapt on v5e. precompute_augment=True remains available for
    # memory-tight setups where the staged bf16 batches win.
    precompute_augment: bool = False
    # Fuse the cheap augmentation composition in one Pallas VMEM pass per
    # rotation side (ops/pallas_augment.cheap_pass); distributionally
    # equivalent to the jnp path (equivalence measured on-chip, round 3).
    # None = auto: on for TPU backends (measured 9.5% faster meta-steps),
    # off elsewhere (the interpret-mode kernel is slow on CPU).
    pallas_augment: Optional[bool] = None
    lr_scheduler: str = "fixed"
    lr_decay_rate: float = 0.5
    lr_decay_after_n_steps: int = 5


def _mean_state_over_tasks(states: ModelState) -> Tuple[Pytree, Pytree]:
    """Average BN stats and optimizer slots over the vmapped task axis."""
    batch_stats = meta_math.tree_mean_over_axis(states.batch_stats)
    opt_v = meta_math.tree_mean_over_axis(states.opt.v)
    opt_step = jax.tree_util.tree_map(lambda x: x[0], states.opt.step)
    return batch_stats, states.opt._replace(v=opt_v, step=opt_step)


def make_per_task_fn(model, loss_config: LossConfig,
                     opt_config: OptimizerConfig, config: MetaTrainConfig,
                     n_max: int, data_shard=None):
    """The single-task half of a meta-step, shared by the single-device,
    microbatched, and mesh-sharded train steps (parallel/mesh.py), so every
    execution strategy has bit-identical per-task semantics.

    Returns per_task(state, task_images_u8, task_masks_u8, count, key, lr)
    -> (update, final ModelState), where `update` is the FOMAML last-step
    displacement (reptile.py:605-647) or, for Reptile, the adapted params
    themselves (the outer step interpolates toward their mean,
    reptile.py:64-125).

    `data_shard` (inner_loop.DataShardSpec) splits every augmented inner
    batch over a mesh data axis with sync-BN and exact axis-aware gradients.
    The FOMAML* tail step is NOT sharded: its tail_shots batch need not
    divide the axis, so every shard runs the full (tiny, un-augmented) tail
    batch identically — replication keeps it exact at the cost of one
    redundant step out of inner_iters.
    """
    adapt = make_adapt_fn(model, loss_config, opt_config,
                          weight_decay_rate=config.weight_decay_rate,
                          augment=config.augment,
                          precompute_augment=config.precompute_augment,
                          pallas_augment=config.pallas_augment,
                          data_shard=data_shard)

    if not config.foml:
        # Gecko.train_step does not forward aug_rate -> default gate.
        aug_rate = None

        def per_task(state, task_images_u8, task_masks_u8, count, key, lr):
            k_shots, k_batches, k_steps = jax.random.split(key, 3)
            shot_idx = episodes.sample_shot_indices(k_shots, count,
                                                    config.num_shots, n_max)
            support_images = task_images_u8[shot_idx]
            support_masks = task_masks_u8[shot_idx]
            idx_matrix = episodes.batch_indices(
                k_batches, config.num_shots, config.inner_batch_size,
                config.inner_iters, config.replacement)
            keys = jax.random.split(k_steps, config.inner_iters)
            lrs = make_lr_array(lr, config.inner_iters, config.lr_scheduler,
                                config.lr_decay_rate,
                                config.lr_decay_after_n_steps)
            adapted, _ = adapt(state, support_images, support_masks,
                               idx_matrix, keys, lrs, aug_rate=aug_rate)
            return adapted.params, adapted

        return per_task

    adapt_raw = make_adapt_fn(model, loss_config, opt_config,
                              weight_decay_rate=config.weight_decay_rate,
                              augment=False)
    aug_rate = config.aug_rate  # FOMLIS forwards self.aug_rate
    tail = config.tail_shots

    def per_task(state, task_images_u8, task_masks_u8, count, key, lr):
        k_shots, k_split, k_batches, k_steps, k_tail = jax.random.split(key, 5)
        shot_idx = episodes.sample_shot_indices(k_shots, count,
                                                config.num_shots, n_max)
        support_images = task_images_u8[shot_idx]
        support_masks = task_masks_u8[shot_idx]

        if tail is not None:
            train_shots = config.num_shots - tail
            if config.sample_train_val_with_replacement:
                train_rel, tail_rel = episodes.split_with_replacement(
                    k_split, config.num_shots, train_shots, tail)
            else:
                train_rel, tail_rel = episodes.split_support_query(
                    k_split, config.num_shots, tail)
            train_images = support_images[train_rel]
            train_masks = support_masks[train_rel]
            idx_matrix = episodes.batch_indices(
                k_batches, train_shots, config.inner_batch_size,
                config.inner_iters - 1, config.replacement)
            keys = jax.random.split(k_steps, config.inner_iters - 1)
            # Schedule over the FULL inner_iters horizon; the tail step runs
            # at the final scheduled lr (identical for the fixed scheduler —
            # the only one the reference's FOMLIS supports: its train_step
            # never consults lr_scheduler, reptile.py:605-643 — but keeps
            # the tail displacement consistent with an annealed schedule
            # instead of jumping back to the initial lr).
            lrs = make_lr_array(lr, config.inner_iters,
                                config.lr_scheduler, config.lr_decay_rate,
                                config.lr_decay_after_n_steps)
            pre_tail, _ = adapt(state, train_images, train_masks, idx_matrix,
                                keys, lrs[:-1], aug_rate=aug_rate)
            # Final step: the raw tail batch (un-augmented, size tail_shots).
            tail_idx = jnp.arange(tail)[None, :]
            final, _ = adapt_raw(pre_tail, support_images[tail_rel],
                                 support_masks[tail_rel], tail_idx,
                                 k_tail[None], lrs[-1:])
        else:
            idx_matrix = episodes.batch_indices(
                k_batches, config.num_shots, config.inner_batch_size,
                config.inner_iters, config.replacement)
            keys = jax.random.split(k_steps, config.inner_iters)
            lrs = make_lr_array(lr, config.inner_iters, config.lr_scheduler,
                                config.lr_decay_rate,
                                config.lr_decay_after_n_steps)
            pre_tail, _ = adapt(state, support_images, support_masks,
                                idx_matrix[:-1], keys[:-1], lrs[:-1],
                                aug_rate=aug_rate)
            final, _ = adapt(pre_tail, support_images, support_masks,
                             idx_matrix[-1:], keys[-1:], lrs[-1:],
                             aug_rate=aug_rate)

        update = meta_math.tree_sub(final.params, pre_tail.params)
        return update, final

    return per_task


def apply_outer_update(state: ModelState, mean_update: Pytree,
                       meta_step_size, foml: bool) -> Pytree:
    """theta <- theta + eps*mean(displacements) (FOMAML, reptile.py:644-647)
    or theta <- theta + eps*(mean(adapted) - theta) (Reptile,
    reptile.py:124-125)."""
    if foml:
        return meta_math.tree_add(
            state.params, meta_math.tree_scale(mean_update, meta_step_size))
    return meta_math.tree_interpolate(state.params, mean_update,
                                      meta_step_size)


def make_train_step(model, loss_config: LossConfig,
                    opt_config: OptimizerConfig, config: MetaTrainConfig,
                    n_max: int):
    """(state, store arrays, key, meta_step_size, lr) -> new ModelState.

    Reptile (Gecko.train_step) or FOMAML/FOMAML* (FOMLIS.train_step)
    according to config.foml, with the meta-batch vmapped."""
    per_task = make_per_task_fn(model, loss_config, opt_config, config, n_max)

    def train_step(state: ModelState, store_images, store_masks, counts, key,
                   meta_step_size, lr) -> ModelState:
        k_tasks, k_inner = jax.random.split(key)
        num_tasks = store_images.shape[0]
        # Slot-indexed streams: identical draws when the same meta-batch runs
        # sharded over a mesh task axis (parallel/mesh.py slices these slots
        # per device), which is what makes sharded-vs-unsharded parity exact.
        task_ids = episodes.slot_task_ids(k_tasks, num_tasks,
                                          config.meta_batch_size)
        task_keys = episodes.slot_keys(k_inner, config.meta_batch_size)
        updates, finals = jax.vmap(
            per_task, in_axes=(None, 0, 0, 0, 0, None)
        )(state, store_images[task_ids], store_masks[task_ids],
          counts[task_ids], task_keys, lr)

        mean_update = meta_math.tree_mean_over_axis(updates)
        new_params = apply_outer_update(state, mean_update, meta_step_size,
                                        config.foml)
        new_bn, new_opt = _mean_state_over_tasks(finals)
        return ModelState(new_params, new_bn, new_opt)

    return train_step


def make_reptile_train_step(model, loss_config, opt_config, config, n_max):
    assert not config.foml
    return make_train_step(model, loss_config, opt_config, config, n_max)


def make_fomaml_train_step(model, loss_config, opt_config, config, n_max):
    assert config.foml
    return make_train_step(model, loss_config, opt_config, config, n_max)


def make_chained_train_step(model, loss_config: LossConfig,
                            opt_config: OptimizerConfig,
                            config: MetaTrainConfig, n_max: int):
    """Single-launch meta-step that runs the meta-batch SEQUENTIALLY inside
    the compiled program (lax.scan over task slots) instead of vmapping it.

    Identical random draws and outer-update math to make_train_step — the
    per-slot keys come from the same slot-indexed streams — but the
    activation working set is ONE task's inner loop at a time, like the
    group_size=1 microbatched path, while the whole meta-step stays a single
    device launch: no host dispatch gaps between tasks and no separate
    combine program. The update/BN/optimizer means accumulate as running
    sums in the scan carry (3 param-sized trees, a few tens of MB).

    Measured v5e motivation (round 3): per-task step time RISES with vmap
    width (HBM pressure), so 5 single-task launches beat one 5-wide launch —
    but those 5 launches pay ~18 ms of host gap each plus a combine launch.
    Chaining keeps the single-task memory profile and removes the gaps.
    """
    per_task = make_per_task_fn(model, loss_config, opt_config, config, n_max)
    m = config.meta_batch_size

    def train_step(state: ModelState, store_images, store_masks, counts, key,
                   meta_step_size, lr) -> ModelState:
        k_tasks, k_inner = jax.random.split(key)
        num_tasks = store_images.shape[0]
        task_ids = episodes.slot_task_ids(k_tasks, num_tasks, m)
        task_keys = episodes.slot_keys(k_inner, m)

        def body(carry, xs):
            tid, tkey = xs
            update, final = per_task(
                state, jnp.take(store_images, tid, axis=0),
                jnp.take(store_masks, tid, axis=0),
                jnp.take(counts, tid, axis=0), tkey, lr)
            sum_u, sum_bn, sum_v, _ = carry
            return (meta_math.tree_add(sum_u, update),
                    meta_math.tree_add(sum_bn, final.batch_stats),
                    meta_math.tree_add(sum_v, final.opt.v),
                    final.opt.step), None

        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        init = (zeros(state.params), zeros(state.batch_stats),
                zeros(state.opt.v), state.opt.step)
        (sum_u, sum_bn, sum_v, last_step), _ = jax.lax.scan(
            body, init, (task_ids, task_keys))

        inv_m = 1.0 / m
        new_params = apply_outer_update(state,
                                        meta_math.tree_scale(sum_u, inv_m),
                                        meta_step_size, config.foml)
        new_opt = state.opt._replace(v=meta_math.tree_scale(sum_v, inv_m),
                                     step=last_step)
        return ModelState(new_params, meta_math.tree_scale(sum_bn, inv_m),
                          new_opt)

    return train_step


def make_group_train_step(model, loss_config: LossConfig,
                          opt_config: OptimizerConfig,
                          config: MetaTrainConfig, n_max: int,
                          group_size: int):
    """A meta-step over `group_size` vmapped task slots of which only the
    first `num_real` (a traced scalar) carry weight — the building block of
    the microbatched step. One compiled shape serves every group, including
    a ragged tail (padded slots still run but contribute zero weight)."""
    group_cfg = dataclasses.replace(config, meta_batch_size=group_size)
    per_task = make_per_task_fn(model, loss_config, opt_config, group_cfg,
                                n_max)

    def group_step(state: ModelState, store_images, store_masks, counts, key,
                   meta_step_size, lr, num_real) -> ModelState:
        k_tasks, k_inner = jax.random.split(key)
        num_tasks = store_images.shape[0]
        task_ids = episodes.slot_task_ids(k_tasks, num_tasks, group_size)
        task_keys = episodes.slot_keys(k_inner, group_size)
        updates, finals = jax.vmap(
            per_task, in_axes=(None, 0, 0, 0, 0, None)
        )(state, store_images[task_ids], store_masks[task_ids],
          counts[task_ids], task_keys, lr)

        w = (jnp.arange(group_size) < num_real).astype(jnp.float32)

        def wmean(tree):
            def f(x):
                wx = w.reshape(w.shape + (1,) * (x.ndim - 1))
                return jnp.sum(x * wx, axis=0) / num_real
            return jax.tree_util.tree_map(f, tree)

        new_params = apply_outer_update(state, wmean(updates), meta_step_size,
                                        config.foml)
        new_bn = wmean(finals.batch_stats)
        new_opt = state.opt._replace(v=wmean(finals.opt.v),
                                     step=finals.opt.step[0])
        return ModelState(new_params, new_bn, new_opt)

    return group_step


def make_microbatched_train_step(model, loss_config: LossConfig,
                                 opt_config: OptimizerConfig,
                                 config: MetaTrainConfig, n_max: int,
                                 group_size: int, pad_tail: bool = False):
    """Meta-step with the meta-batch processed in HBM-sized task groups.

    Both Reptile and FOMAML outer updates are linear in the per-task
    results, so a meta-batch of m tasks can run as ceil(m/g) device
    launches of <= g vmapped tasks whose group updates are combined on the
    host with task-count weights — bit-equivalent in expectation to the
    single-launch step, at a few ms of launch overhead. Used when m tasks'
    activations exceed one chip's HBM (224px batch-8 inner loops fit ~2-3
    tasks per 16 GB v5e chip at bf16).

    A ragged tail (5 = 2+2+1) can run two ways:
      - pad_tail=False (default): one compiled program per distinct group
        size (<= 2 programs). Best steady-state throughput — the tail
        launch does exactly its share of work. Measured on v5e: 7.45 s vs
        8.98 s per run.sh meta-step against the padded mode (the padded
        tail recomputes a full group, +20% FLOPs). The persistent
        compilation cache (utils/cache.py) absorbs the extra program's
        one-time ~45-70 s axon remote compile.
      - pad_tail=True: ONE compiled program of `group_size` slots with a
        traced real-task count; padded slots carry zero weight. For
        compile-budgeted environments without a warm cache."""
    m = config.meta_batch_size
    sizes = []
    remaining = m
    while remaining > 0:
        take = min(group_size, remaining)
        sizes.append(take)
        remaining -= take
    if pad_tail:
        padded_step = jax.jit(
            make_group_train_step(model, loss_config, opt_config, config,
                                  n_max, group_size=min(group_size, m)))
        steps = {size: padded_step for size in set(sizes)}
    else:
        steps = {
            size: jax.jit(make_group_train_step(
                model, loss_config, opt_config, config, n_max,
                group_size=size))
            for size in set(sizes)}

    weights = tuple(s / m for s in sizes)

    @jax.jit
    def _combine_states(state: ModelState, *group_states) -> ModelState:
        # One jitted program instead of ~leaves x groups eager dispatches
        # (measured: the eager combine cost hundreds of ms of host time per
        # meta-step at 5 single-task groups).
        def combine(base, *groups):
            # theta_new = theta + sum_g w_g * (theta_g - theta)
            delta = sum(w * (g - base) for w, g in zip(weights, groups))
            return base + delta

        new_params = jax.tree_util.tree_map(
            combine, state.params, *[g.params for g in group_states])
        new_bn = jax.tree_util.tree_map(
            combine, state.batch_stats,
            *[g.batch_stats for g in group_states])
        new_opt_v = jax.tree_util.tree_map(
            combine, state.opt.v, *[g.opt.v for g in group_states])
        new_opt = state.opt._replace(v=new_opt_v,
                                     step=group_states[0].opt.step)
        return ModelState(new_params, new_bn, new_opt)

    def train_step(state: ModelState, store_images, store_masks, counts, key,
                   meta_step_size, lr) -> ModelState:
        group_states = []
        for g, size in enumerate(sizes):
            gkey = jax.random.fold_in(key, g)
            group_states.append(steps[size](
                state, store_images, store_masks, counts, gkey,
                meta_step_size, lr, jnp.float32(size)))
        return _combine_states(state, *group_states)

    return train_step


def meta_step_size_schedule(step: int, meta_iters: int, initial: float,
                            final: float) -> float:
    """Linear anneal (train.py:92)."""
    frac_done = step / meta_iters
    return frac_done * final + (1.0 - frac_done) * initial
