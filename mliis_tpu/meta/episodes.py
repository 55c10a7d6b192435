"""Traceable episode sampling and inner-loop batch assembly.

Replaces the reference's host-side sampling stack (metaseg.py:233-343 and the
`_mini_batches` generator) with keyed, jit/vmap-safe index arithmetic:

  - support/query splits are shuffled permutation splits
    (shuffle_before_split=True semantics of _split_train_test_segmentation);
  - without-replacement mini-batch epochs are concatenated permutations of
    the support set — exactly the distribution of the reference's
    shuffle-walk-reshuffle generator, whose partial batches carry across
    epoch boundaries (metaseg.py:285-302);
  - with-replacement batches draw `batch_size` distinct examples per batch
    (random.sample semantics, metaseg.py:275-283);
  - per-step batch assembly gathers from the (tiny) support arrays and runs
    the fused augmentation kernels inside the scanned SGD step, so no
    augmented batch is ever materialized outside the XLA program.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def onehot_mask(mask_u8: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] uint8 fg-255 mask -> [..., H, W, 2] float32 one-hot,
    matching the tfrecord parse (input_fn.py:62-63)."""
    mask = mask_u8.astype(jnp.float32)
    return jnp.stack([255.0 - mask, mask], axis=-1) / 255.0


def sample_task_ids(key, num_tasks: int, meta_batch_size: int) -> jnp.ndarray:
    """Uniform task sampling with replacement across the meta-batch (the
    reference draws each task independently, reptile.py:104-107)."""
    return jax.random.randint(key, (meta_batch_size,), 0, num_tasks)


def slot_keys(key, num_slots: int, offset=0) -> jnp.ndarray:
    """Per-meta-batch-slot PRNG keys derived by global slot index.

    Keying by slot (not by array position) makes the random stream identical
    whether the meta-batch runs in one launch, in microbatched groups, or
    sharded over a mesh task axis where device d owns slots
    [d*local_n, (d+1)*local_n) — the basis of the sharded-vs-unsharded
    parity guarantee (and test)."""
    slots = offset + jnp.arange(num_slots)
    return jax.vmap(lambda s: jax.random.fold_in(key, s))(slots)


def slot_task_ids(key, num_tasks: int, num_slots: int, offset=0
                  ) -> jnp.ndarray:
    """Uniform-with-replacement task draw per slot, keyed by slot index."""
    keys = slot_keys(key, num_slots, offset)
    return jax.vmap(lambda k: jax.random.randint(k, (), 0, num_tasks))(keys)


def sample_shot_indices(key, count: jnp.ndarray, num_shots: int,
                        n_max: int) -> jnp.ndarray:
    """Draw `num_shots` distinct example indices among the `count` valid slots
    of a padded task row. If count < num_shots, valid indices repeat
    (the reference clips num_shots instead — with FSS-1000 every task has
    >= 10 examples so the branch is vestigial; repetition keeps shapes
    static while sampling only valid examples)."""
    scores = jax.random.uniform(key, (n_max,))
    scores = jnp.where(jnp.arange(n_max) < count, scores, jnp.inf)
    order = jnp.argsort(scores)
    picks = order[:num_shots]
    # Remap any picks that landed on padded slots back into valid range.
    rank = jnp.arange(num_shots)
    return jnp.where(rank < count, picks, order[rank % jnp.maximum(count, 1)])


def split_support_query(key, total: int, test_shots: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shuffle then split-off the last `test_shots` (metaseg.py:321-343)."""
    perm = jax.random.permutation(key, total)
    return perm[: total - test_shots], perm[total - test_shots:]


def split_with_replacement(key, total: int, train_shots: int, test_shots: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both sides drawn i.i.d. with replacement (metaseg.py:313-318)."""
    k1, k2 = jax.random.split(key)
    train = jax.random.randint(k1, (train_shots,), 0, total)
    test = jax.random.randint(k2, (test_shots,), 0, total)
    return train, test


def epoch_batch_indices(key, n: int, batch_size: int,
                        num_batches: int) -> jnp.ndarray:
    """[num_batches, batch_size] indices into an n-example support set,
    cycling without replacement through reshuffled epochs."""
    needed = num_batches * batch_size
    n_epochs = -(-needed // n)  # ceil
    keys = jax.random.split(key, n_epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)
    return perms.reshape(-1)[:needed].reshape(num_batches, batch_size)


def replacement_batch_indices(key, n: int, batch_size: int,
                              num_batches: int) -> jnp.ndarray:
    """Each batch is `batch_size` distinct examples, batches independent."""
    if batch_size > n:
        # The reference's random.sample(samples, batch_size) raises here
        # too (metaseg.py:276); silently truncating would hand callers a
        # narrower batch than configured.
        raise ValueError(
            "replacement sampling needs batch_size <= pool size "
            "({} > {})".format(batch_size, n))
    keys = jax.random.split(key, num_batches)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)
    return perms[:, :batch_size]


def batch_indices(key, n: int, batch_size: int, num_batches: int,
                  replacement: bool = False) -> jnp.ndarray:
    if replacement:
        return replacement_batch_indices(key, n, batch_size, num_batches)
    return epoch_batch_indices(key, n, batch_size, num_batches)


def assemble_batch(support_images_u8: jnp.ndarray,
                   support_masks_u8: jnp.ndarray,
                   idx: jnp.ndarray, key,
                   aug_rate: Optional[float] = None,
                   augment: bool = True,
                   use_pallas: bool = False,
                   key_offset=0, key_total=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather one inner-loop batch and augment it on-device.

    Args:
      support_images_u8: [S, H, W, 3] uint8; support_masks_u8: [S, H, W] uint8.
      idx: [B] indices into the support set.
      aug_rate: probability to augment each sample; None uses the Augmenter
        default gate of n/(n+1) (np_augmenters.py:141, the rate Gecko
        meta-training runs at when no aug_rate is passed).
      use_pallas: fuse the cheap composition in VMEM
        (ops.augment.augment_batch_pallas; distributionally equivalent).
      key_offset/key_total: when `idx` is the local slice of a batch split
        over a mesh data axis, key_offset is this shard's first global
        sample position and key_total the global batch size — per-sample
        keys then match the unsharded batch (ops.augment._batch_keys).
    Returns: images [B, H, W, 3] float32 in [0,255], masks [B, H, W, 2] f32.
    """
    from mliis_tpu.ops.augment import (augment_batch,  # local: avoid cycle
                                       augment_batch_pallas)

    images = support_images_u8[idx].astype(jnp.float32)
    masks = onehot_mask(support_masks_u8[idx])
    if not augment:
        return images, masks
    prob_original = None if aug_rate is None else 1.0 - aug_rate
    if use_pallas:
        return augment_batch_pallas(key, images, masks, prob_original,
                                    key_offset=key_offset,
                                    key_total=key_total)
    return augment_batch(key, images, masks, prob_original,
                         key_offset=key_offset, key_total=key_total)
