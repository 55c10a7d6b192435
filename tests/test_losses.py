"""Loss numerics tests: CE vs. closed forms, label smoothing, dice, l2/l1
filters, weighted (padded) batches."""
import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.ops import losses


def _np_softmax_ce(logits, labels, smoothing=0.0):
    n_classes = logits.shape[-1]
    labels = labels * (1 - smoothing) + smoothing / n_classes
    z = logits - logits.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    return float(np.mean(-(labels * logp).sum(axis=-1)))


def test_ce_matches_numpy(rng):
    logits = rng.normal(size=(10, 2)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 10)]
    ours = float(losses.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - _np_softmax_ce(logits, labels)) < 1e-5


def test_ce_label_smoothing(rng):
    logits = rng.normal(size=(10, 2)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 10)]
    ours = float(losses.softmax_cross_entropy(jnp.asarray(logits),
                                              jnp.asarray(labels), 0.1))
    assert abs(ours - _np_softmax_ce(logits, labels, 0.1)) < 1e-5


def test_ce_weighted_mean_over_nonzero(rng):
    logits = rng.normal(size=(6, 2)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 6)]
    w = np.array([1, 1, 1, 1, 0, 0], np.float32)
    ours = float(losses.softmax_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), weights=jnp.asarray(w)))
    expected = _np_softmax_ce(logits[:4], labels[:4])
    assert abs(ours - expected) < 1e-4


def test_soft_dice_adjustment():
    ce = jnp.float32(1.0)
    iou = jnp.float32(1.0)
    # perfect IoU -> dice = 1 -> -ln(1) = 0 adjustment
    assert abs(float(losses.soft_dice_adjustment(ce, iou)) - 1.0) < 1e-6
    iou = jnp.float32(0.5)
    expected = 1.0 - np.log(2 * 0.5 / 1.5)
    assert abs(float(losses.soft_dice_adjustment(ce, iou)) - expected) < 1e-4


def test_l2_excludes_batch_norm(rng):
    params = {
        "conv": {"kernel": jnp.ones((2, 2))},
        "batch_normalization": {"scale": jnp.full((4,), 10.0)},
        "decoder_bn_1": {"bias": jnp.full((4,), 10.0)},
    }
    # Only the conv kernel should contribute: 5e-4 * (4 * 1^2) / 2
    val = float(losses.l2_term(params))
    assert abs(val - 0.0005 * 4 / 2) < 1e-9

    l1 = float(losses.l1_term(params))
    assert abs(l1 - 0.0005 * 4) < 1e-9


def test_darc1(rng):
    logits = jnp.asarray(np.array([[[[1.0, -2.0]]], [[[3.0, 0.5]]]], np.float32))
    # sum over batch of |logits| per position: [4.0, 2.5] -> max 4.0
    val = float(losses.darc1_term(logits))
    assert abs(val - 0.0005 * 4.0) < 1e-9


def test_segmentation_loss_end_to_end(rng):
    n, h, w, c = 2, 4, 4, 2
    logits = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    probs = jax.nn.softmax(logits)
    fg = (rng.random((n, h, w)) > 0.5).astype(np.float32)
    labels = jnp.asarray(np.stack([1 - fg, fg], axis=-1))
    params = {"conv": {"kernel": jnp.ones((2, 2))}}
    loss = losses.segmentation_loss(logits, probs, labels, params,
                                    dice=True, l2=True)
    assert np.isfinite(float(loss))
    # dice adjustment should make loss larger than plain CE + l2 when IoU < 1
    plain = losses.segmentation_loss(logits, probs, labels, params,
                                     dice=False, l2=True)
    assert float(loss) > float(plain)


def test_segmentation_loss_weighted_ignores_padding(rng):
    n, h, w, c = 3, 4, 4, 2
    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    fg = (rng.random((n, h, w)) > 0.5).astype(np.float32)
    labels = np.stack([1 - fg, fg], axis=-1).astype(np.float32)

    jl = jnp.asarray(logits)
    probs = jax.nn.softmax(jl)
    weights = jnp.array([1.0, 1.0, 0.0])
    loss_weighted = losses.segmentation_loss(jl, probs, jnp.asarray(labels),
                                             None, dice=True,
                                             example_weights=weights)
    jl2 = jnp.asarray(logits[:2])
    probs2 = jax.nn.softmax(jl2)
    loss_trunc = losses.segmentation_loss(jl2, probs2, jnp.asarray(labels[:2]),
                                          None, dice=True)
    assert abs(float(loss_weighted) - float(loss_trunc)) < 1e-5


def test_darc1_respects_example_weights():
    """Padded batch slots must not feed the DARC1 regularizer: the masked
    full-batch loss equals the loss of the unpadded prefix alone."""
    from mliis_tpu.ops.losses import darc1_term
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 3, 3, 2)).astype(np.float32))
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    masked = darc1_term(logits, example_weights=w)
    prefix = darc1_term(logits[:2])
    np.testing.assert_allclose(float(masked), float(prefix), rtol=1e-6)
    assert float(darc1_term(logits)) != float(prefix)


def test_segmentation_loss_data_axis_matches_unsharded():
    """data_axis_name: every batch-level reduction (CE mean, dice's mean
    IoU, darc1's batch sum, weighted counts) must cross the mesh axis so a
    shard returns the exact full-batch loss — including zero-weight padded
    slots landing on only some shards."""
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(0)
    n, h, w, c = 8, 4, 4, 2
    logits = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    labels = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, c, size=(n, h, w))), c)
    params = {"conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3)),
                                             jnp.float32)}}
    weights = jnp.asarray([1, 1, 1, 0, 1, 1, 0, 1], jnp.float32)

    for use_weights in (False, True):
        w_arg = weights if use_weights else None
        ref = losses.segmentation_loss(
            logits, probs, labels, params, label_smoothing=0.1, dice=True,
            l2=True, darc1=True, example_weights=w_arg)

        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

        def local(lg, pr, lb, wt=None):
            return losses.segmentation_loss(
                lg, pr, lb, params, label_smoothing=0.1, dice=True,
                l2=True, darc1=True, example_weights=wt,
                data_axis_name="data")

        if use_weights:
            sharded = shard_map(
                local, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data"), P("data")),
                out_specs=P(), check_vma=False)
            out = jax.jit(sharded)(logits, probs, labels, weights)
        else:
            sharded = shard_map(
                local, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data")),
                out_specs=P(), check_vma=False)
            out = jax.jit(sharded)(logits, probs, labels)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)
