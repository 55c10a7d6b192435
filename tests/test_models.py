"""Model architecture parity tests: endpoint shapes/channels, truncation,
compound scaling, param counts, bf16 compute path, resize semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.models.efficientnet import (EfficientNetFeatures,
                                           expand_block_list, round_filters,
                                           round_repeats)
from mliis_tpu.models.efficientlab import (EfficientLab,
                                           predictions_from_probabilities)
from mliis_tpu.ops.resize import resize_bilinear_align_corners


def test_round_filters_b3_values():
    # width 1.2: the reference values for the b3 backbone channels
    assert round_filters(112, 1.2) == 136  # aspp_dimension for b3
    assert round_filters(32, 1.2) == 40    # stem
    assert round_filters(16, 1.0) == 16    # identity at width 1.0


def test_round_repeats():
    assert round_repeats(3, 1.4) == 5
    assert round_repeats(1, 1.4) == 2
    assert round_repeats(4, 1.0) == 4


def test_b0_truncation_block_count():
    blocks, divisor = expand_block_list("efficientnet-b0", max_block_num=10)
    assert len(blocks) == 11  # blocks 0..10 (cut at reduction_4)
    assert divisor == 11
    assert blocks[-1].output_filters == 112


def test_b3_truncation_block_count():
    blocks, divisor = expand_block_list("efficientnet-b3", max_block_num=17)
    assert len(blocks) == 18  # blocks 0..17
    # decode-level truncation keeps all 7 stages for b3 (raw repeats 16
    # <= 18), so the reference drop-connect divisor is the full 26 blocks.
    assert divisor == 26
    assert blocks[-1].output_filters == 136


@pytest.mark.parametrize("name,size,channels",
                         [("efficientnet-b0", 64, (16, 24, 40, 112))])
def test_endpoint_shapes(name, size, channels):
    feat = EfficientNetFeatures(model_name=name, max_block_num=10)
    x = jnp.zeros((1, size, size, 3))
    variables = feat.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    _, endpoints = feat.apply(variables, x, train=False)
    for i, ch in enumerate(channels, start=1):
        ep = endpoints["reduction_{}".format(i)]
        assert ep.shape == (1, size // (2 ** i), size // (2 ** i), ch)


def test_efficientlab_bf16_compute():
    model = EfficientLab(rsd=(2,), final_layer_dropout_rate=0.0,
                         compute_dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    # params stay float32
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    logits, probs = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32
    assert probs.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(probs)).all()


def test_predictions_threshold():
    probs = jnp.asarray([[0.4, 0.6], [0.5, 0.5]])
    preds = predictions_from_probabilities(probs)
    np.testing.assert_array_equal(np.asarray(preds),
                                  [[0.0, 1.0], [0.0, 0.0]])


def test_resize_align_corners_identity_and_corners(rng):
    x = jnp.asarray(rng.random((1, 5, 5, 2)).astype(np.float32))
    same = resize_bilinear_align_corners(x, 5, 5)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))
    up = resize_bilinear_align_corners(x, 9, 9)
    # align_corners: corner pixels map exactly
    np.testing.assert_allclose(np.asarray(up)[0, 0, 0], np.asarray(x)[0, 0, 0],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up)[0, -1, -1],
                               np.asarray(x)[0, -1, -1], rtol=1e-5)
    # midpoint of a 2x upsample is the average of neighbors
    np.testing.assert_allclose(
        np.asarray(up)[0, 0, 1],
        (np.asarray(x)[0, 0, 0] + np.asarray(x)[0, 0, 1]) / 2, rtol=1e-5)


def test_resize_linear_in_input():
    a = jnp.ones((1, 4, 4, 1))
    b = 2 * a
    ra = resize_bilinear_align_corners(a, 7, 7)
    rb = resize_bilinear_align_corners(b, 7, 7)
    np.testing.assert_allclose(np.asarray(rb), 2 * np.asarray(ra), rtol=1e-6)


def test_aspp_and_skip_decoding_paths_build():
    model = EfficientLab(rsd=(2,), spatial_pyramid_pooling=True,
                         skip_decoding=True, final_layer_dropout_rate=0.2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)
    (logits, probs), _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert logits.shape == (1, 64, 64, 2)
    assert "spatial_pyramid_pooling" in variables["params"]
    assert "sep_conv_0" in variables["params"]


def test_fused_batch_norm_matches_flax(rng):
    """FusedBatchNorm (the default BN) must match flax nn.BatchNorm in both
    modes with an identical variable tree — checkpoint compatibility and
    numerics (docs/PERF_NOTES.md lever 2)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from mliis_tpu.models.layers import FusedBatchNorm

    x = jnp.asarray(rng.normal(size=(8, 4, 4, 3)).astype(np.float32) * 3 + 1)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-3, name="batch_normalization")
    fused = FusedBatchNorm(name="batch_normalization")
    variables = ref.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                fused.init(jax.random.PRNGKey(1), x,
                           use_running_average=False)))
    y_ref, mut_ref = ref.apply(variables, x, mutable=["batch_stats"])
    y_fus, mut_fus = fused.apply(variables, x, use_running_average=False,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_fus),
                    jax.tree_util.tree_leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    y_inf_ref = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3,
                             name="batch_normalization").apply(variables, x)
    y_inf_fus = fused.apply(variables, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(y_inf_fus), np.asarray(y_inf_ref),
                               atol=1e-5)
