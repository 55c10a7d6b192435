"""Joint (non-meta) training baseline: N-way segmentation over all tasks.

Reference: joint_train.py — EfficientLab with n_classes = number of FSS
classes (+ background channel 0), trained by plain SGD over shuffled shards
with a linear per-epoch LR anneal (joint_train.py:332-335), periodic val-IoU
callbacks (:248-258) and checkpointing. (Its `get_model_kwargs` reads the
nonexistent `parsed_args.lsd` — joint_train.py:92 — which silently dropped
the rsd config; fixed here, not reproduced.)

TPU-native design departures:
  - labels are integer class maps, not 1001-channel one-hot tensors; the CE
    loss gathers log-probabilities at the label index, so the only
    full-channel tensor is the logits themselves;
  - many SGD steps run per device launch via lax.scan over pre-sampled
    batch indices (the whole epoch is index arithmetic over the
    device-resident example store);
  - augmentation (translate/fliplr/noise/exposure — the joint-path subset,
    joint_train.py:140-148) runs on-device on (image, int-mask) pairs.
"""
import dataclasses
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.data.task_store import TaskStore
from mliis_tpu.meta.inner_loop import (ModelState, OptimizerConfig, OptState,
                                       apply_optimizer, init_opt_state)
from mliis_tpu.ops import augment as augment_lib
from mliis_tpu.utils import checkpoint as ckpt_lib
from mliis_tpu.utils.logging import MetricsWriter


@dataclasses.dataclass
class JointDataset:
    """Flat example store with integer class masks (0 = background)."""
    images: np.ndarray        # [N, H, W, 3] uint8
    labels: np.ndarray        # [N, H, W] int32 class ids
    class_names: List[str]    # index c-1 -> name (0 is background)

    @property
    def num_examples(self) -> int:
        return self.images.shape[0]

    @property
    def num_classes(self) -> int:
        return len(self.class_names)


def joint_dataset_from_task_store(store: TaskStore,
                                  class_names: Optional[List[str]] = None
                                  ) -> JointDataset:
    """Flatten a per-task store into a joint dataset; class id = 1 + index of
    the task name in the sorted global class list (the reference's channel
    assignment, fss_1000_image_to_joint_tfrecord_shards.py)."""
    if class_names is None:
        class_names = sorted(store.names)
    name_to_id = {n: i + 1 for i, n in enumerate(class_names)}
    images, labels = [], []
    for t in range(store.num_tasks):
        n = int(store.counts[t])
        class_id = name_to_id[store.names[t]]
        images.append(store.images[t, :n])
        fg = store.masks[t, :n] > 127
        labels.append(fg.astype(np.int32) * class_id)
    return JointDataset(np.concatenate(images), np.concatenate(labels),
                        class_names)


def _augment_joint(key, image, label, num_classes: int):
    """Joint-path augmentation on (image [H,W,3], int label [H,W]).

    A uniformly-random prefix (length 1..4) of a uniformly-random
    permutation of [translate, fliplr, noise, exposure] — the reference
    joint Augmenter composition (joint_train.py:140-148 +
    np_augmenters.py:144-156 with prob_original 0), the same semantics as
    the Pallas kernel branch (pallas_augment.fused_light_augment). Label
    background fill is class 0. Every stage draws from its own split key
    (fold_in(key, d) is bit-identical to split(key, n)[d] under threefry,
    so mixing the two on one key couples the streams)."""
    del num_classes
    n = 4
    k_perm, k_count, k_fns = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, n)
    num_to_apply = jax.random.randint(k_count, (), 1, n + 1)
    fn_keys = jax.random.split(k_fns, n)
    label_f = label.astype(image.dtype)

    def apply_translate(k, img, lab):
        from mliis_tpu.ops.augment import _roll_dynamic
        ks = jax.random.split(k, 5)
        vert = jax.random.bernoulli(ks[0])
        direction = jax.random.bernoulli(ks[1])
        shift = jax.random.randint(ks[2], (), 1, 24)
        shift = jnp.where(direction, shift, -shift)
        roll = jax.random.bernoulli(ks[3])
        img_fill = jax.random.uniform(ks[4], (3,), minval=0.0, maxval=255.0)

        def shifted(arr, ax, fill):
            rolled = _roll_dynamic(arr, shift, ax)
            idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape[:2], ax)
            if arr.ndim == 3:
                idx = idx[..., None]
            size = arr.shape[ax]
            stripe = jnp.where(shift >= 0, idx < shift,
                               idx >= size + shift)
            filled = jnp.where(stripe, fill, rolled)
            return jnp.where(roll, rolled, filled)

        new_img = jnp.where(vert,
                            shifted(img, 0, img_fill[None, None, :]),
                            shifted(img, 1, img_fill[None, None, :]))
        new_lab = jnp.where(vert, shifted(lab, 0, jnp.zeros(())),
                            shifted(lab, 1, jnp.zeros(())))
        return new_img, new_lab

    def apply_fliplr(k, img, lab):
        del k
        return img[:, ::-1, :], lab[:, ::-1]

    def apply_noise(k, img, lab):
        img, _ = augment_lib.additive_gaussian_noise(
            k, img, jnp.zeros(img.shape[:2] + (1,)))
        return img, lab

    def apply_exposure(k, img, lab):
        img, _ = augment_lib.exposure(k, img,
                                      jnp.zeros(img.shape[:2] + (1,)))
        return img, lab

    branches = [apply_translate, apply_fliplr, apply_noise, apply_exposure]
    for step in range(n):
        new_img, new_lab = jax.lax.switch(perm[step], branches,
                                          fn_keys[step], image, label_f)
        keep = step < num_to_apply
        image = jnp.where(keep, new_img, image)
        label_f = jnp.where(keep, new_lab, label_f)
    return image, jnp.round(label_f).astype(label.dtype)


def sparse_segmentation_loss(logits, labels, label_smoothing: float = 0.0):
    """Mean CE over pixels with integer labels (no one-hot materialized)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    n_classes = logits.shape[-1]
    picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    if label_smoothing:
        # smoothed CE = (1-eps)*CE(label) + eps/C * sum_c CE(c)
        mean_all = jnp.mean(log_probs, axis=-1)
        picked = (1.0 - label_smoothing) * picked + label_smoothing * mean_all
    return -jnp.mean(picked)


@dataclasses.dataclass
class JointTrainConfig:
    batch_size: int = 8
    epochs: int = 200
    steps_per_epoch: Optional[int] = None
    learning_rate: float = 0.005
    final_learning_rate: float = 5e-7
    label_smoothing: float = 0.0
    augment: bool = True
    l2: bool = True
    eval_interval: int = 2
    val_batches: int = 20
    save_checkpoint_every_n_epochs: int = 2
    steps_per_launch: int = 8   # SGD steps fused per device launch
    # Fused Pallas augmentation kernel (ops/pallas_augment.py) instead of
    # the jnp composition. None = auto (on for TPU backends). Both branches
    # implement the reference's random-prefix Augmenter composition
    # (np_augmenters.py:144-156); they differ only in PRNG stream
    # (on-core vs jax.random), i.e. distributionally equivalent.
    use_pallas_augment: Optional[bool] = None


class JointTrainer:
    """Single-device or data-parallel joint trainer.

    With `mesh` (a jax.sharding.Mesh with a "data" axis,
    parallel.mesh.make_data_mesh) the batch dimension shards across the mesh
    via shard_map: each device augments and forward/backwards its local
    shard, gradients are pmean'd over the axis, and BatchNorm moments sync
    across devices through the model's `bn_axis_name="data"` (the TPU-native
    form of the reference's TpuBatchNormalization cross_replica_sum,
    /root/reference/models/efficientnet/utils.py:96-134 — its only
    distributed-communication code). With sync-BN the sharded step is
    numerically identical to the unsharded full-batch step (up to reduction
    order) for deterministic models: augmentation keys derive from GLOBAL
    sample positions on both the jnp and Pallas branches. Stochastic
    regularizers (dropout, the backbone's drop-connect) draw per-shard
    streams — same distribution, different samples — so models using them
    match the unsharded step only in distribution. Parity is asserted in
    tests/test_parallel.py for both augmentation branches.
    """

    def __init__(self, model, dataset: JointDataset, val_dataset: JointDataset,
                 config: JointTrainConfig,
                 opt_config: OptimizerConfig = OptimizerConfig("sgd"),
                 mesh=None):
        self.model = model
        self.config = config
        self.opt_config = opt_config
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.mesh = mesh
        self._images = jnp.asarray(dataset.images)
        self._labels = jnp.asarray(dataset.labels)
        self._val_images = jnp.asarray(val_dataset.images)
        self._val_labels = jnp.asarray(val_dataset.labels)
        on_tpu = jax.default_backend() == "tpu"
        self._use_pallas = (on_tpu if config.use_pallas_augment is None
                            else config.use_pallas_augment)
        # Off-TPU the kernel runs in Pallas interpret mode (tests/CI).
        self._pallas_interpret = not on_tpu
        if mesh is not None:
            self._train_launch = self._make_sharded_train_launch(mesh)
        else:
            self._train_launch = jax.jit(self._make_train_launch(),
                                         donate_argnums=(0,))
        self._val_step = jax.jit(self._make_val_step())

    def _loss(self, params, batch_stats, images, labels, key):
        (logits, _), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"])
        loss = sparse_segmentation_loss(logits, labels,
                                        self.config.label_smoothing)
        if self.config.l2:
            from mliis_tpu.ops.losses import l2_term
            loss = loss + l2_term(params)
        return loss, mutated["batch_stats"]

    def _make_step_fn(self, axis_name: Optional[str] = None):
        """One SGD step on one (possibly local-shard) batch.

        `sample_offset` is the global batch position of this shard's first
        sample: per-sample augmentation keys derive from the GLOBAL sample
        index, so the sharded step draws exactly the augmentations the
        unsharded full-batch step would."""
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        cfg = self.config

        def step_fn(st: ModelState, idx, key, lr, images_store, labels_store,
                    sample_offset):
            k_aug, k_drop = jax.random.split(key)
            images = images_store[idx].astype(jnp.float32)
            labels = labels_store[idx]
            if cfg.augment and self._use_pallas:
                import contextlib
                from jax.experimental.pallas import tpu as pltpu
                from mliis_tpu.ops.pallas_augment import \
                    fused_light_augment
                # Per-GLOBAL-sample seeds (like the jnp branch below) so the
                # sharded step draws exactly the augmentations the unsharded
                # full-batch step would.
                positions = sample_offset + jnp.arange(images.shape[0])
                seeds = jax.vmap(lambda i: jax.random.randint(
                    jax.random.fold_in(k_aug, i), (), 0,
                    jnp.iinfo(jnp.int32).max))(positions)
                ctx = (pltpu.force_tpu_interpret_mode()
                       if self._pallas_interpret
                       else contextlib.nullcontext())
                # prob_original=0.0: the joint input_fn calls
                # apply_augmentations with its default gate
                # (joint_train/data/input_fn.py:80-83).
                with ctx:
                    images, labels = fused_light_augment(
                        seeds, images, labels, prob_original=0.0)
            elif cfg.augment:
                positions = sample_offset + jnp.arange(idx.shape[0])
                aug_keys = jax.vmap(
                    lambda i: jax.random.fold_in(k_aug, i))(positions)
                images, labels = jax.vmap(
                    lambda k, i, l: _augment_joint(
                        k, i, l, self.dataset.num_classes)
                )(aug_keys, images, labels)
            if axis_name is not None:
                # Distinct dropout streams per shard (the full-batch dropout
                # mask is not shardable by key; distribution unchanged).
                k_drop = jax.random.fold_in(k_drop, sample_offset)
            (loss, new_bn), grads = grad_fn(st.params, st.batch_stats,
                                            images, labels, k_drop)
            if axis_name is not None:
                loss = jax.lax.pmean(loss, axis_name)
                grads = jax.lax.pmean(grads, axis_name)
            new_params, new_opt = apply_optimizer(
                st.params, grads, st.opt, lr, self.opt_config)
            return ModelState(new_params, new_bn, new_opt), loss

        return step_fn

    def _make_train_launch(self):
        step_fn = self._make_step_fn(axis_name=None)

        def launch(state: ModelState, batch_idx, keys, lr):
            def step(carry, xs):
                idx, key = xs
                return step_fn(carry, idx, key, lr, self._images,
                               self._labels, 0)

            return jax.lax.scan(step, state, (batch_idx, keys))

        return launch

    def _make_sharded_train_launch(self, mesh):
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mliis_tpu.parallel.mesh import DATA_AXIS
        n_dev = mesh.shape[DATA_AXIS]
        assert self.config.batch_size % n_dev == 0, \
            "batch_size must be a multiple of the data-mesh size"
        local_b = self.config.batch_size // n_dev
        bn_axis = getattr(self.model, "bn_axis_name", None)
        assert bn_axis == DATA_AXIS, (
            "data-parallel joint training requires the model built with "
            "bn_axis_name='data' (sync-BN); got {!r}".format(bn_axis))
        step_fn = self._make_step_fn(axis_name=DATA_AXIS)

        def shard_fn(state, images_store, labels_store, batch_idx, keys, lr):
            offset = jax.lax.axis_index(DATA_AXIS) * local_b

            def step(carry, xs):
                idx, key = xs
                return step_fn(carry, idx, key, lr, images_store,
                               labels_store, offset)

            return jax.lax.scan(step, state, (batch_idx, keys))

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, DATA_AXIS), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        jitted = jax.jit(sharded, donate_argnums=(0,))
        # Replicate the example stores once (they are shard_map inputs) and
        # drop the single-device copies from __init__ — in sharded mode
        # nothing reads them, and keeping both doubles the dataset's HBM.
        replicated = NamedSharding(mesh, P())
        images_r = jax.device_put(self._images, replicated)
        labels_r = jax.device_put(self._labels, replicated)
        self._images = images_r
        self._labels = labels_r

        def launch(state: ModelState, batch_idx, keys, lr):
            return jitted(state, images_r, labels_r, batch_idx, keys, lr)

        return launch

    def _make_val_step(self):
        def val_step(state: ModelState, idx):
            images = self._val_images[idx].astype(jnp.float32)
            labels = self._val_labels[idx]
            logits, probs = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=False)
            loss = sparse_segmentation_loss(logits, labels)
            preds = jnp.argmax(probs, axis=-1)
            # KNOWN-ODD METRIC, kept for parity: the reference's joint "IoU"
            # (Gecko._iou with class_of_interest_channel=None,
            # reptile.py:526-549 via joint_train.py:248-267) intersects the
            # FULL one-hot maps, which degenerates to a pixel-accuracy form
            # acc/(2-acc) — not a per-class IoU. Reproduced, not endorsed.
            inter = jnp.sum(preds == labels, axis=(1, 2)).astype(jnp.float32)
            total = labels.shape[1] * labels.shape[2]
            union = 2 * total - inter
            iou = jnp.mean((inter + 1e-7) / (union + 1e-7))
            return iou, loss

        return val_step

    def lr_fn(self, epoch: int) -> float:
        frac_done = epoch / self.config.epochs
        return (frac_done * self.config.final_learning_rate
                + (1 - frac_done) * self.config.learning_rate)

    def train(self, state: ModelState, save_dir: str, key,
              time_deadline: Optional[float] = None,
              log_fn=print) -> ModelState:
        cfg = self.config
        os.makedirs(save_dir, exist_ok=True)
        writer = MetricsWriter(save_dir, "joint_train")
        steps_per_epoch = cfg.steps_per_epoch
        if steps_per_epoch is None:
            steps_per_epoch = max(
                int(self.dataset.num_examples // cfg.batch_size), 1)
        n = self.dataset.num_examples
        ious = []
        for epoch in range(cfg.epochs):
            start = time.time()
            lr = self.lr_fn(epoch)
            # Shuffled once-per-epoch visit order like the reference's
            # repeat->shuffle tf.data stream (input_fn.py): each example is
            # seen ~once per epoch. (i.i.d. randint sampling would leave
            # ~1/e of the examples unseen in any given epoch.)
            key, k_perm = jax.random.split(key)
            total_needed = steps_per_epoch * cfg.batch_size
            reps = -(-total_needed // n)
            order = jnp.concatenate([
                jax.random.permutation(jax.random.fold_in(k_perm, r), n)
                for r in range(reps)])
            epoch_idx = order[:total_needed].reshape(steps_per_epoch,
                                                     cfg.batch_size)
            done = 0
            while done < steps_per_epoch:
                launch_steps = min(cfg.steps_per_launch,
                                   steps_per_epoch - done)
                key, k_steps = jax.random.split(key)
                batch_idx = epoch_idx[done:done + launch_steps]
                keys = jax.random.split(k_steps, launch_steps)
                state, losses = self._train_launch(state, batch_idx, keys,
                                                   jnp.float32(lr))
                done += launch_steps
            jax.block_until_ready(state.params)
            elapsed = time.time() - start
            log_fn("Epoch {}: lr {:.2e}, {} steps, {:.2f} iters/s".format(
                epoch, lr, steps_per_epoch, steps_per_epoch / elapsed))
            writer.scalar("iters_per_sec", steps_per_epoch / elapsed, epoch)

            if epoch % cfg.eval_interval == 0:
                val_ious, val_losses = [], []
                for _ in range(cfg.val_batches):
                    key, k_val = jax.random.split(key)
                    idx = jax.random.randint(
                        k_val, (cfg.batch_size,), 0,
                        self.val_dataset.num_examples)
                    iou, loss = self._val_step(state, idx)
                    val_ious.append(float(iou))
                    val_losses.append(float(loss))
                iou = float(np.nanmean(val_ious))
                ious.append(iou)
                log_fn("Val IoU at epoch {}: {} (loss {})".format(
                    epoch, iou, float(np.nanmean(val_losses))))
                writer.scalar("val_IoU", iou, epoch)
                writer.scalar("val_loss", float(np.nanmean(val_losses)), epoch)

            if (epoch % cfg.save_checkpoint_every_n_epochs == 0
                    or epoch == cfg.epochs - 1):
                ckpt_lib.save_checkpoint(save_dir, state, epoch)
            if time_deadline is not None and time.time() > time_deadline:
                break
        writer.close()
        log_fn("Training complete. History: {}".format(ious))
        return state
