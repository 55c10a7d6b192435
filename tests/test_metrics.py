"""Metric identity tests from the reference's oracle set (SURVEY.md §4):
self-IoU = 1, disjoint IoU ~ eps, CE/dice numerics, ci95 closed form."""
import jax.numpy as jnp
import numpy as np

from mliis_tpu.ops import metrics


def _np_reference_iou(prediction, label, epsilon=1e-7, channel=1):
    """Direct transcription of the reference _iou semantics for oracle use."""
    prediction = prediction[:, :, channel]
    label = label[:, :, channel]
    prediction = np.round(prediction)
    label = np.round(label)
    inter = np.logical_and(prediction, label)
    union = np.logical_or(label, prediction)
    return (np.sum(inter) + epsilon) / (np.sum(union) + epsilon)


def _onehot_mask(fg):
    return np.stack([1.0 - fg, fg], axis=-1).astype(np.float32)


def test_self_iou_is_one(rng):
    fg = (rng.random((16, 16)) > 0.5).astype(np.float32)
    m = _onehot_mask(fg)
    iou = metrics.hard_iou(jnp.asarray(m), jnp.asarray(m))
    assert abs(float(iou) - 1.0) < 1e-6


def test_disjoint_iou_is_near_zero():
    a = np.zeros((8, 8), np.float32)
    a[:4] = 1.0
    b = np.zeros((8, 8), np.float32)
    b[4:] = 1.0
    iou = metrics.hard_iou(jnp.asarray(_onehot_mask(a)), jnp.asarray(_onehot_mask(b)))
    assert float(iou) < 1e-5


def test_empty_empty_iou_is_one():
    """No predictions, no labels -> eps/eps = 1 (reference eps semantics)."""
    z = _onehot_mask(np.zeros((8, 8), np.float32))
    iou = metrics.hard_iou(jnp.asarray(z), jnp.asarray(z))
    assert abs(float(iou) - 1.0) < 1e-6


def test_hard_iou_matches_numpy_reference(rng):
    for _ in range(5):
        pred = (rng.random((12, 12)) > 0.4).astype(np.float32)
        lab = (rng.random((12, 12)) > 0.6).astype(np.float32)
        p, l = _onehot_mask(pred), _onehot_mask(lab)
        ours = float(metrics.hard_iou(jnp.asarray(p), jnp.asarray(l)))
        ref = _np_reference_iou(p, l)
        assert abs(ours - ref) < 1e-6


def test_batched_hard_iou_matches_per_image(rng):
    preds = np.stack([_onehot_mask((rng.random((8, 8)) > 0.5).astype(np.float32))
                      for _ in range(4)])
    labs = np.stack([_onehot_mask((rng.random((8, 8)) > 0.5).astype(np.float32))
                     for _ in range(4)])
    batched = np.asarray(metrics.batched_hard_iou(jnp.asarray(preds), jnp.asarray(labs)))
    singles = [float(metrics.hard_iou(jnp.asarray(preds[i]), jnp.asarray(labs[i])))
               for i in range(4)]
    np.testing.assert_allclose(batched, singles, rtol=1e-6)


def test_soft_iou_of_identical_binary_is_one(rng):
    # Soft IoU equals 1 on identical *binary* masks (sum(p*p)=sum(p));
    # for non-binary probabilities it is < 1 by construction.
    binary = (rng.random((3, 8, 8)) > 0.5).astype(np.float32)
    flat = jnp.asarray(binary.reshape(3, -1))
    iou = metrics.soft_iou_flat(flat, flat)
    assert abs(float(iou) - 1.0) < 1e-5
    soft = jnp.asarray(rng.random((3, 64)).astype(np.float32))
    assert float(metrics.soft_iou_flat(soft, soft)) < 1.0


def test_soft_binary_iou_foreground_channel_only(rng):
    fg = rng.random((2, 8, 8)).astype(np.float32)
    y = np.stack([1 - fg, fg], axis=-1)
    # Perturb the background channel only; fg-channel IoU must be unchanged.
    y2 = y.copy()
    y2[..., 0] = rng.random((2, 8, 8))
    a = float(metrics.soft_binary_iou(jnp.asarray(y), jnp.asarray(y)))
    b = float(metrics.soft_binary_iou(jnp.asarray(y), jnp.asarray(y2)))
    assert abs(a - b) < 1e-6


def test_shaban_measure_and_iou_img():
    y = jnp.asarray(np.array([[1, 1], [0, 0]], np.float32))
    p = jnp.asarray(np.array([[1, 0], [1, 0]], np.float32))
    tp, tn, fp, fn = metrics.measure(y, p)
    assert (int(tp), int(tn), int(fp), int(fn)) == (1, 1, 1, 1)
    assert abs(float(metrics.iou_img(tp, fp, fn)) - 1.0 / 3.0) < 1e-6


def test_ci95_closed_form():
    a = [1.0, 2.0, 3.0, 4.0]
    expected = 1.96 * np.std(a) / np.sqrt(4)
    assert abs(metrics.ci95(a) - expected) < 1e-12
