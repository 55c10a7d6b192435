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
                                       OptimizerConfig)
from mliis_tpu.meta.learners import (MetaTrainConfig, apply_outer_update,
                                     make_per_task_fn)

TASK_AXIS = "task"
DATA_AXIS = "data"


def make_task_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (TASK_AXIS,))


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """Mesh with a "data" axis: the joint trainer's batch dimension shards
    over it and BatchNorm pmeans its moments across it (sync-BN — the
    TPU-native form of TpuBatchNormalization's cross_replica_sum,
    /root/reference/models/efficientnet/utils.py:96-134)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_task_data_mesh(num_task_devices: int,
                        num_data_devices: int) -> Mesh:
    """2D (task, data) mesh: the meta-batch shards over the task axis while
    each task's inner-loop batch splits over the data axis with sync-BN —
    full utilization when meta_batch < device count, and per-device
    activation-memory headroom for larger images/batches."""
    n = num_task_devices * num_data_devices
    devices = jax.devices()[:n]
    assert len(devices) == n, \
        "need {} devices for a {}x{} mesh".format(n, num_task_devices,
                                                  num_data_devices)
    return Mesh(np.array(devices).reshape(num_task_devices,
                                          num_data_devices),
                (TASK_AXIS, DATA_AXIS))


def make_sharded_train_step(model, loss_config: LossConfig,
                            opt_config: OptimizerConfig,
                            config: MetaTrainConfig, n_max: int, mesh: Mesh,
                            chain_local: bool = False):
    """Meta-train step with the meta-batch sharded over the task axis.

    Per-task semantics come from learners.make_per_task_fn — the same
    function the single-device and microbatched steps vmap — and the random
    streams are slot-indexed (episodes.slot_task_ids/slot_keys), so for a
    given key this step is numerically identical to the unsharded
    learners.make_train_step up to psum reduction order (asserted by
    tests/test_parallel.py).

    With a 2D (task, data) mesh (make_task_data_mesh) each task row's inner
    batches additionally split over the data axis: sync-BN moments and
    axis-aware loss reductions make the per-task adaptation exact w.r.t.
    the unsharded step (inner_loop.DataShardSpec; dropout streams excepted).

    chain_local=True runs each device's local task slots sequentially
    inside the program (lax.map) instead of vmapping them — the sharded
    form of learners.make_chained_train_step, for meta_batch > mesh size:
    single-task activation footprint per device (per-task time rises with
    vmap width on v5e — docs/PERF_NOTES.md). Identical numbers either way.
    """
    num_devices = mesh.shape[TASK_AXIS]
    m = config.meta_batch_size
    local_n = -(-m // num_devices)  # ceil
    data_shard = None
    if DATA_AXIS in mesh.shape:
        from mliis_tpu.meta.inner_loop import DataShardSpec
        n_data = mesh.shape[DATA_AXIS]
        if n_data > 1:
            assert config.inner_batch_size % n_data == 0, \
                "inner_batch_size must be a multiple of the data-mesh size"
            bn_axis = getattr(model, "bn_axis_name", None)
            assert bn_axis == DATA_AXIS, (
                "a (task, data) mesh requires the model built with "
                "bn_axis_name='data' (sync-BN); got {!r}".format(bn_axis))
            assert not config.precompute_augment, \
                "data-axis sharding augments in-scan (precompute unsupported)"
            data_shard = DataShardSpec(axis_name=DATA_AXIS,
                                       num_shards=n_data)
    per_task = make_per_task_fn(model, loss_config, opt_config, config, n_max,
                                data_shard=data_shard)

    def shard_fn(state, store_images, store_masks, counts, key,
                 meta_step_size, lr):
        dev = jax.lax.axis_index(TASK_AXIS)
        num_tasks = store_images.shape[0]
        k_tasks, k_inner = jax.random.split(key)
        # Deterministic global sampling: device d draws global slots
        # [d*local_n, (d+1)*local_n); slots >= m carry zero weight.
        offset = dev * local_n
        global_slots = offset + jnp.arange(local_n)
        task_ids = episodes.slot_task_ids(k_tasks, num_tasks, local_n,
                                          offset=offset)
        inner_keys = episodes.slot_keys(k_inner, local_n, offset=offset)
        weights = (global_slots < m).astype(jnp.float32)

        if chain_local:
            updates, finals = jax.lax.map(
                lambda xs: per_task(state, xs[0], xs[1], xs[2], xs[3], lr),
                (store_images[task_ids], store_masks[task_ids],
                 counts[task_ids], inner_keys))
        else:
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

        new_params = apply_outer_update(state, wmean(updates), meta_step_size,
                                        config.foml)
        new_bn = wmean(finals.batch_stats)
        new_opt = state.opt._replace(
            v=wmean(finals.opt.v), step=finals.opt.step[0])
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
    if config.chain_chunk:
        # Each device runs its local chunk slice sequentially (lax.map):
        # single-task activation footprint per device, like the unsharded
        # chain_chunk path — per-task time rises with vmap width on v5e
        # (HBM pressure), and --mesh_tasks must not silently discard
        # --chain_eval_chunk.
        def vmapped(state, imgs, msks, cnts, keys, lr, dr, ar):
            return jax.lax.map(
                lambda xs: eval_task(state, xs[0], xs[1], xs[2], xs[3],
                                     lr, dr, ar),
                (imgs, msks, cnts, keys))
    else:
        vmapped = jax.vmap(eval_task,
                           in_axes=(None, 0, 0, 0, 0, None, None, None))

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
