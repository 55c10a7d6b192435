"""Segmentation metrics: evaluation (hard) IoU, training (soft) IoU, CIs.

Numerics match the reference exactly:
  - hard per-image binary IoU with rounding and eps smoothing
    (/root/reference/.../reptile.py:526-549),
  - batched soft IoU used inside the dice loss
    (/root/reference/models/efficientlab.py:329-396),
  - Shaban et al. tp/fp/fn metric (reptile.py:555-566),
  - 95% CI = 1.96 sigma / sqrt(n) (/root/reference/utils/util.py:133-136).

All jnp functions are pure and jit/vmap-safe.
"""
from typing import Optional

import jax.numpy as jnp
import numpy as np

EPSILON = 1e-7


def hard_iou(prediction: jnp.ndarray, label: jnp.ndarray, epsilon: float = EPSILON,
             class_channel: Optional[int] = 1, round_labels: bool = True) -> jnp.ndarray:
    """Hard IoU of a single image's prediction vs. label.

    Args:
      prediction: [H, W, C] float scores (already-thresholded {0,1} in the
        standard eval path, since the model emits `probs > 0.5`).
      label: [H, W, C] float one-hot mask.
      class_channel: channel of the class of interest (1 = foreground for the
        binary [bg, fg] encoding); None compares all channels.
    """
    if class_channel is not None:
        prediction = prediction[..., class_channel]
        label = label[..., class_channel]
    prediction = jnp.round(prediction)
    if round_labels:
        label = jnp.round(label)
    pred_b = prediction.astype(bool)
    label_b = label.astype(bool)
    intersection = jnp.sum(jnp.logical_and(pred_b, label_b))
    union = jnp.sum(jnp.logical_or(pred_b, label_b))
    return (intersection + epsilon) / (union + epsilon)


def batched_hard_iou(predictions: jnp.ndarray, labels: jnp.ndarray,
                     class_channel: Optional[int] = 1) -> jnp.ndarray:
    """Per-image hard IoUs for a batch: [N, H, W, C] -> [N]."""
    if class_channel is not None:
        predictions = predictions[..., class_channel]
        labels = labels[..., class_channel]
    pred_b = jnp.round(predictions).astype(bool)
    label_b = jnp.round(labels).astype(bool)
    axes = tuple(range(1, pred_b.ndim))
    intersection = jnp.sum(jnp.logical_and(pred_b, label_b), axis=axes)
    union = jnp.sum(jnp.logical_or(pred_b, label_b), axis=axes)
    return (intersection + EPSILON) / (union + EPSILON)


def soft_iou_flat_per_example(true_flat: jnp.ndarray, pred_flat: jnp.ndarray,
                              epsilon: float = EPSILON) -> jnp.ndarray:
    """Per-example soft IoU between [N, D] flattened probability tensors."""
    intersection = jnp.sum(pred_flat * true_flat, axis=1)
    denominator = jnp.sum(pred_flat, axis=1) + jnp.sum(true_flat, axis=1) - intersection
    return (intersection + epsilon) / (denominator + epsilon)


def soft_iou_flat(true_flat: jnp.ndarray, pred_flat: jnp.ndarray,
                  epsilon: float = EPSILON) -> jnp.ndarray:
    """Soft IoU between [N, D] flattened probability tensors; mean over N."""
    return jnp.mean(soft_iou_flat_per_example(true_flat, pred_flat, epsilon))


def soft_binary_iou(y_true: jnp.ndarray, y_hat: jnp.ndarray, epsilon: float = EPSILON,
                    foreground_channel: int = 1) -> jnp.ndarray:
    """Batched soft IoU on the foreground channel: [N, H, W, 2] inputs."""
    true_fg = y_true[..., foreground_channel]
    pred_fg = y_hat[..., foreground_channel]
    n = true_fg.shape[0]
    return soft_iou_flat(true_fg.reshape(n, -1), pred_fg.reshape(n, -1), epsilon)


def soft_multiclass_iou(y_true: jnp.ndarray, y_hat: jnp.ndarray, epsilon: float = EPSILON,
                        exclude_bg_channel: bool = False) -> jnp.ndarray:
    """Batched soft IoU over all (or all-but-background) channels."""
    if exclude_bg_channel:
        y_true = y_true[..., 1:]
        y_hat = y_hat[..., 1:]
    n = y_true.shape[0]
    return soft_iou_flat(y_true.reshape(n, -1), y_hat.reshape(n, -1), epsilon)


def measure(y: jnp.ndarray, pred: jnp.ndarray, thresh: float = 0.5):
    """Shaban et al. tp/tn/fp/fn counts."""
    y_b = y > thresh
    p_b = pred > thresh
    tp = jnp.sum(jnp.logical_and(y_b, p_b))
    tn = jnp.sum(jnp.logical_and(~y_b, ~p_b))
    fp = jnp.sum(jnp.logical_and(~y_b, p_b))
    fn = jnp.sum(jnp.logical_and(y_b, ~p_b))
    return tp, tn, fp, fn


def iou_img(tp, fp, fn):
    return tp / jnp.maximum(tp + fp + fn, 1).astype(jnp.float32)


def ci95(a) -> float:
    """95% confidence interval half-width (population sigma, like np.std)."""
    a = np.asarray(a, dtype=np.float64)
    return float(1.96 * np.std(a) / np.sqrt(len(a)))


def nanmean(a) -> float:
    return float(np.nanmean(np.asarray(a, dtype=np.float64)))
