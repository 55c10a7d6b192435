"""Dataset debugging / visual-verification utilities.

Parity with utils/debug_tf_dataset.py: inspect episodic batches, verify the
self-IoU-of-label invariant (a label must score IoU 1.0 against itself), and
plot masks — the reference's stand-in for data-pipeline tests.
"""
from typing import Optional

import numpy as np

from mliis_tpu.data.task_store import TaskStore
from mliis_tpu.ops.metrics import hard_iou


def check_task_store(store: TaskStore, log_fn=print) -> bool:
    """Sanity-check every task: shapes, dtype, counts, mask encoding, and
    the self-IoU invariant on a sample."""
    ok = True
    assert store.images.dtype == np.uint8 and store.masks.dtype == np.uint8
    for t in range(store.num_tasks):
        count = int(store.counts[t])
        if count == 0:
            log_fn("Task {} has no examples".format(store.names[t]))
            ok = False
            continue
        masks = store.masks[t, :count]
        values = np.unique(masks)
        if not np.isin(values, [0, 255]).all():
            log_fn("Task {} has non-binary mask values: {}".format(
                store.names[t], values[:10]))
            ok = False
    # Self-IoU spot check on the first task (debug_tf_dataset.py:41-43).
    import jax.numpy as jnp
    mask = store.masks[0, 0].astype(np.float32)
    onehot = jnp.asarray(np.stack([255.0 - mask, mask], -1) / 255.0)
    self_iou = float(hard_iou(onehot, onehot))
    if abs(self_iou - 1.0) > 1e-6:
        log_fn("Self-IoU of label != 1: {}".format(self_iou))
        ok = False
    log_fn("TaskStore check: {} tasks, {} examples total, ok={}".format(
        store.num_tasks, int(store.counts.sum()), ok))
    return ok


def plot_mask(mask: np.ndarray, figure_index: int = 0,
              channel_index: Optional[int] = None,
              show: bool = True, save_path: Optional[str] = None) -> int:
    """Plot one mask channel (first nonzero channel when unspecified).

    Accepts [H, W] (plotted as-is; returns -1) or [H, W, C] masks. With
    show=True the figure stays open for plt.show(); otherwise it is closed
    after the optional save."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if mask.ndim == 2:
        k = -1
        plane = mask
    elif channel_index is None:
        k = 0
        for k in range(mask.shape[2]):
            if np.sum(mask[:, :, k]) > 0:
                break
        plane = mask[:, :, k]
    else:
        k = channel_index
        plane = mask[:, :, k]
    fig = plt.figure(figure_index)
    plt.imshow(plane)
    if save_path:
        fig.savefig(save_path)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return k
