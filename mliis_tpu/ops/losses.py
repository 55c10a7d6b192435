"""Loss functions: label-smoothed softmax CE, soft-dice adjustment, regularizers.

Numerics match the reference:
  - CE over flattened pixels with label smoothing, mean over nonzero-weight
    pixels, exactly `tf.losses.softmax_cross_entropy`
    (/root/reference/models/efficientlab.py:296-297);
  - bce_dice: loss = CE - ln(2*IoU / (IoU + 1)) (efficientlab.py:319-327);
  - l2 / l1 terms at 5e-4 over trainable params excluding batch-norm
    (/root/reference/models/regularizers.py:8-22), where l2_loss(v) is
    sum(v^2)/2 (TF semantics);
  - darc1 = 5e-4 * max_j sum_i |logits_ij| (regularizers.py:24-26).

Padded batches are supported through per-example `weights`; zero-weight
examples contribute nothing and do not count in the mean (matching TF's
SUM_BY_NONZERO_WEIGHTS reduction).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mliis_tpu.ops.metrics import soft_iou_flat_per_example

Pytree = Any

# Module-path substrings identifying batch-norm parameters, excluded from
# l1/l2 weight decay like the reference's 'batch_normalization' name filter.
_BN_PATH_TOKENS = ("batch_normalization", "batchnorm", "bn")


def _axis_sum(x, data_axis_name: Optional[str]):
    """Sum a local reduction across a device mesh axis (identity when the
    computation is not sharded). Used to make batch-global reductions exact
    when the batch dimension is split over a `shard_map` data axis."""
    if data_axis_name is None:
        return x
    return jax.lax.psum(x, data_axis_name)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          label_smoothing: float = 0.0,
                          weights: Optional[jnp.ndarray] = None,
                          data_axis_name: Optional[str] = None) -> jnp.ndarray:
    """Label-smoothed softmax cross entropy, mean over (weighted) examples.

    Args:
      logits: [M, C] unnormalized scores (M = flattened pixels).
      labels: [M, C] one-hot (or soft) targets.
      weights: optional [M] per-example weights; mean is taken over examples
        with nonzero weight.
      data_axis_name: when M is the local shard of a batch split over a mesh
        axis, reductions cross the axis so the result equals the full-batch
        mean (every shard returns the same global scalar).
    """
    num_classes = logits.shape[-1]
    if label_smoothing:
        labels = labels * (1.0 - label_smoothing) + label_smoothing / num_classes
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_example = -jnp.sum(labels * log_probs, axis=-1)
    if weights is None:
        total = _axis_sum(jnp.sum(per_example), data_axis_name)
        count = _axis_sum(jnp.asarray(per_example.shape[0], per_example.dtype),
                          data_axis_name)
        return total / count
    num_nonzero = jnp.maximum(
        _axis_sum(jnp.sum(weights != 0), data_axis_name), 1)
    return _axis_sum(jnp.sum(per_example * weights), data_axis_name) / num_nonzero


def soft_dice_adjustment(ce_loss: jnp.ndarray, iou: jnp.ndarray) -> jnp.ndarray:
    """bce_dice loss: CE - ln(dice) with dice = 2*IoU/(IoU+1)."""
    dice = (2.0 * iou) / (iou + 1.0)
    return ce_loss - jnp.log(dice)


def _is_bn_path(path) -> bool:
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", str(entry))
        key = str(key).lower()
        if any(tok in key for tok in _BN_PATH_TOKENS):
            return True
    return False


def l2_term(params: Pytree, weight_decay: float = 0.0005) -> jnp.ndarray:
    """weight_decay * sum of sum(v^2)/2 over non-batch-norm params."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not _is_bn_path(path):
            total = total + jnp.sum(jnp.square(leaf)) / 2.0
    return weight_decay * total


def l1_term(params: Pytree, weight_decay: float = 0.0005) -> jnp.ndarray:
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not _is_bn_path(path):
            total = total + jnp.sum(jnp.abs(leaf))
    return weight_decay * total


def darc1_term(logits: jnp.ndarray, weight: float = 0.0005,
               example_weights: Optional[jnp.ndarray] = None,
               data_axis_name: Optional[str] = None) -> jnp.ndarray:
    """DARC1 regularizer on final activations; batch dim first.

    `example_weights` masks padded batch slots out of the batch sum (the
    other loss terms already honor it; unmasked garbage logits would
    otherwise feed the regularizer's gradient). With `data_axis_name` the
    batch sum crosses the mesh axis before the max (the batch-global
    semantics of the unsharded term)."""
    flat = jnp.abs(logits.reshape(logits.shape[0], -1))
    if example_weights is not None:
        flat = flat * example_weights[:, None]
    return weight * jnp.max(_axis_sum(jnp.sum(flat, axis=0), data_axis_name))


def segmentation_loss(logits: jnp.ndarray, probabilities: jnp.ndarray,
                      labels: jnp.ndarray, params: Optional[Pytree] = None, *,
                      label_smoothing: float = 0.0, dice: bool = True,
                      binary_iou_loss: bool = True, l2: bool = True,
                      l1: bool = False, darc1: bool = False,
                      example_weights: Optional[jnp.ndarray] = None,
                      data_axis_name: Optional[str] = None) -> jnp.ndarray:
    """The full EfficientLab training loss (efficientlab.py:294-317).

    Args:
      logits: [N, H, W, C]; probabilities: softmax(logits); labels: [N, H, W, C].
      example_weights: optional [N] mask for padded batch slots.
      data_axis_name: set when N is the local shard of a batch split over a
        mesh axis: every batch-level reduction (CE mean, the dice term's
        mean IoU, darc1's batch sum) crosses the axis, so each shard returns
        the exact full-batch loss. The l2/l1 parameter terms are computed
        locally (params are replicated, so they are already identical on
        every shard, and `lax.pmean` of the resulting gradients keeps them
        at their true scale — see inner_loop.make_loss_and_grad).
    """
    n, h, w, c = logits.shape
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1, c)
    pixel_weights = None
    if example_weights is not None:
        pixel_weights = jnp.repeat(example_weights, h * w)
    loss = softmax_cross_entropy(flat_logits, flat_labels, label_smoothing,
                                 weights=pixel_weights,
                                 data_axis_name=data_axis_name)
    if dice:
        if binary_iou_loss:
            true_flat = labels[..., 1].reshape(n, -1)
            pred_flat = probabilities[..., 1].reshape(n, -1)
        else:
            true_flat = labels.reshape(n, -1)
            pred_flat = probabilities.reshape(n, -1)
        per_image_iou = soft_iou_flat_per_example(true_flat, pred_flat)
        if example_weights is None:
            iou = (_axis_sum(jnp.sum(per_image_iou), data_axis_name)
                   / _axis_sum(jnp.asarray(n, per_image_iou.dtype),
                               data_axis_name))
        else:
            iou = (_axis_sum(jnp.sum(per_image_iou * example_weights),
                             data_axis_name)
                   / jnp.maximum(_axis_sum(jnp.sum(example_weights),
                                           data_axis_name), 1))
        loss = soft_dice_adjustment(loss, iou)
    if darc1:
        loss = loss + darc1_term(logits, example_weights=example_weights,
                                 data_axis_name=data_axis_name)
    if params is not None:
        if l2:
            loss = loss + l2_term(params)
        if l1:
            loss = loss + l1_term(params)
    return loss
