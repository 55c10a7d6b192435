"""Property tests for pytree meta-update math vs. closed forms.

Oracles come from the reference's variables.py semantics (interpolate =
old + eps*(new-old), average = elementwise mean, etc.)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.ops import meta_math as mm


def _tree(rng, scale=1.0):
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * scale,
                                       jnp.float32)},
        "bias": jnp.asarray(rng.normal(size=(8,)) * scale, jnp.float32),
    }


def test_interpolate_matches_closed_form(rng):
    old, new = _tree(rng), _tree(rng)
    eps = 0.3
    out = mm.tree_interpolate(old, new, eps)
    expected = np.asarray(old["bias"]) + eps * (np.asarray(new["bias"])
                                                - np.asarray(old["bias"]))
    np.testing.assert_allclose(np.asarray(out["bias"]), expected, rtol=1e-6)


def test_interpolate_endpoints(rng):
    old, new = _tree(rng), _tree(rng)
    at_zero = mm.tree_interpolate(old, new, 0.0)
    at_one = mm.tree_interpolate(old, new, 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(at_zero),
                    jax.tree_util.tree_leaves(old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(at_one),
                    jax.tree_util.tree_leaves(new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_average_and_mean_over_axis_agree(rng):
    trees = [_tree(rng) for _ in range(5)]
    avg = mm.tree_average(trees)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    avg2 = mm.tree_mean_over_axis(stacked, axis=0)
    for a, b in zip(jax.tree_util.tree_leaves(avg),
                    jax.tree_util.tree_leaves(avg2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_weighted_mean_masks_padded_slots(rng):
    trees = [_tree(rng) for _ in range(4)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    weights = jnp.array([1.0, 1.0, 1.0, 0.0])
    out = mm.tree_weighted_mean_over_axis(stacked, weights)
    expected = mm.tree_average(trees[:3])
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_add_sub_scale_roundtrip(rng):
    a, b = _tree(rng), _tree(rng)
    out = mm.tree_add(mm.tree_sub(a, b), b)
    for x, y in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(a)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6)
    scaled = mm.tree_scale(a, 2.0)
    np.testing.assert_allclose(np.asarray(scaled["bias"]),
                               2.0 * np.asarray(a["bias"]), rtol=1e-6)


def test_reptile_identity(rng):
    """theta + eps*(mean(new) - theta) == interpolate(theta, average(new), eps)."""
    theta = _tree(rng)
    news = [_tree(rng) for _ in range(3)]
    eps = 0.1
    via_avg = mm.tree_interpolate(theta, mm.tree_average(news), eps)
    manual = mm.tree_add(theta, mm.tree_scale(
        mm.tree_sub(mm.tree_average(news), theta), eps))
    for a, b in zip(jax.tree_util.tree_leaves(via_avg),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_weight_decay_and_count(rng):
    a = _tree(rng)
    decayed = mm.tree_weight_decay(a, 0.99)
    np.testing.assert_allclose(np.asarray(decayed["bias"]),
                               0.99 * np.asarray(a["bias"]), rtol=1e-6)
    assert mm.tree_count_params(a) == 3 * 3 * 4 * 8 + 8


def test_weighted_mean_nonzero_axis_and_zero_weights():
    """axis=1 weights the second dimension (not the leading one) and
    all-zero weights return zeros, not inf."""
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    w = jnp.asarray([1.0, 0.0, 3.0])
    out = mm.tree_weighted_mean_over_axis({"x": x}, w, axis=1)["x"]
    expect = (x[:, 0] * 1.0 + x[:, 2] * 3.0) / 4.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6)
    zero = mm.tree_weighted_mean_over_axis({"x": x}, jnp.zeros(3),
                                           axis=1)["x"]
    assert np.isfinite(np.asarray(zero)).all()
    np.testing.assert_allclose(np.asarray(zero), 0.0)
