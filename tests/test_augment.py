"""Augmentation-engine tests against the reference numpy semantics:
mask/image transformed consistently, erased regions -> background, one-hot
invariant preserved, gate probability, determinism under keys."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.ops import augment

H = W = 32


def _pair(rng):
    image = rng.random((H, W, 3)).astype(np.float32) * 255.0
    fg = np.zeros((H, W), np.float32)
    fg[8:24, 8:24] = 1.0
    mask = np.stack([1.0 - fg, fg], axis=-1).astype(np.float32)
    return jnp.asarray(image), jnp.asarray(mask)


def _check_onehot(mask, atol=1e-5):
    sums = np.asarray(mask).sum(axis=-1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=atol)


@pytest.mark.parametrize("fn", list(augment.AUG_FUNCS),
                         ids=[f.__name__ for f in augment.AUG_FUNCS])
def test_shapes_and_finiteness(fn, rng):
    image, mask = _pair(rng)
    key = jax.random.PRNGKey(3)
    out_img, out_mask = jax.jit(fn)(key, image, mask)
    assert out_img.shape == image.shape
    assert out_mask.shape == mask.shape
    assert np.isfinite(np.asarray(out_img)).all()
    assert np.isfinite(np.asarray(out_mask)).all()


@pytest.mark.parametrize("fn", [augment.fliplr, augment.translate,
                                augment.random_eraser],
                         ids=["fliplr", "translate", "eraser"])
def test_mask_stays_onehot(fn, rng):
    image, mask = _pair(rng)
    for seed in range(5):
        _, out_mask = fn(jax.random.PRNGKey(seed), image, mask)
        _check_onehot(out_mask)


def test_fliplr_is_involution(rng):
    image, mask = _pair(rng)
    key = jax.random.PRNGKey(0)
    i1, m1 = augment.fliplr(key, image, mask)
    i2, m2 = augment.fliplr(key, i1, m1)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(image))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mask))


def test_fliplr_flips_columns(rng):
    image, mask = _pair(rng)
    out_img, _ = augment.fliplr(jax.random.PRNGKey(0), image, mask)
    np.testing.assert_allclose(np.asarray(out_img),
                               np.asarray(image)[:, ::-1, :])


def test_eraser_region_is_background(rng):
    image, mask = _pair(rng)
    for seed in range(10):
        out_img, out_mask = augment.random_eraser(
            jax.random.PRNGKey(seed), image, mask)
        changed = np.any(np.asarray(out_img) != np.asarray(image), axis=-1)
        if changed.any():
            # Everywhere the image changed, mask must be background [1, 0].
            assert np.allclose(np.asarray(out_mask)[changed, 0], 1.0)
            assert np.allclose(np.asarray(out_mask)[changed, 1], 0.0)
            # Erased region is a single uniform value.
            vals = np.asarray(out_img)[changed]
            assert np.allclose(vals, vals.flat[0])


def test_noise_ops_do_not_touch_mask(rng):
    image, mask = _pair(rng)
    for fn in (augment.additive_gaussian_noise, augment.exposure):
        _, out_mask = fn(jax.random.PRNGKey(7), image, mask)
        np.testing.assert_allclose(np.asarray(out_mask), np.asarray(mask))


def test_noise_clip_range(rng):
    image, mask = _pair(rng)
    out_img, _ = augment.additive_gaussian_noise(jax.random.PRNGKey(1), image, mask)
    arr = np.asarray(out_img)
    assert arr.min() >= 0.0 and arr.max() <= 255.0


def test_translate_preserves_mass_when_rolling(rng):
    """When the roll branch is taken, fg pixel count is conserved."""
    image, mask = _pair(rng)
    found_roll = False
    fg_count = float(np.asarray(mask)[..., 1].sum())
    for seed in range(20):
        _, out_mask = augment.translate(jax.random.PRNGKey(seed), image, mask)
        out_count = float(np.asarray(out_mask)[..., 1].sum())
        if abs(out_count - fg_count) < 1e-3:
            found_roll = True
        else:
            assert out_count < fg_count + 1e-3  # fill only removes foreground
    assert found_roll


def _rotate_fixed(image, mask, angle, mode_idx, rng):
    noise = jnp.asarray(rng.integers(0, 256, image.shape).astype(np.float32))
    return augment._apply_rotation(image, mask, jnp.float32(angle),
                                   jnp.int32(mode_idx),
                                   jnp.bool_(False), jnp.float32(0.0), noise)


def test_rotate_identity_at_zero_angle(rng):
    """With angle 0 the rotation resamples near-identically in every mode."""
    image, mask = _pair(rng)
    for mode_idx in range(4):
        out_img, out_msk = _rotate_fixed(image, mask, 0.0, mode_idx, rng)
        np.testing.assert_allclose(np.asarray(out_img), np.asarray(image),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_msk), np.asarray(mask),
                                   atol=1e-3)


def test_rotate_90_matches_numpy(rng):
    image, mask = _pair(rng)
    out_img, _ = _rotate_fixed(image, mask, 90.0, 1, rng)  # constant mode
    # A 90-degree rotation must equal np.rot90 (up to direction convention).
    match_cw = np.isclose(np.asarray(out_img),
                          np.rot90(np.asarray(image), k=1, axes=(1, 0)),
                          atol=1e-2).mean()
    match_ccw = np.isclose(np.asarray(out_img),
                           np.rot90(np.asarray(image), k=1, axes=(0, 1)),
                           atol=1e-2).mean()
    assert max(match_cw, match_ccw) > 0.95


def test_rotate_45_constant_mask_background(rng):
    """45-degree constant-mode rotation: corner regions become background."""
    image, mask = _pair(rng)
    out_img, out_msk = _rotate_fixed(image, mask, 45.0, 1, rng)
    arr = np.asarray(out_msk)
    # corners of the rotated frame are out of bounds -> background one-hot
    assert arr[0, 0, 0] == 1.0 and arr[0, 0, 1] == 0.0
    assert arr[0, -1, 0] == 1.0
    _check_onehot(out_msk, atol=1e-3)
    assert np.isfinite(np.asarray(out_img)).all()


def test_rotate_wrap_mode_preserves_onehot(rng):
    image, mask = _pair(rng)
    for mode_idx in (0, 2, 3):  # reflect, mirror, wrap: in-bounds folds
        _, out_msk = _rotate_fixed(image, mask, 30.0, mode_idx, rng)
        _check_onehot(out_msk, atol=1e-3)


def test_apply_gate_returns_original(rng):
    image, mask = _pair(rng)
    out_img, out_mask = augment.apply_augmentations(
        jax.random.PRNGKey(0), image, mask, prob_to_return_original=1.0)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(image))
    np.testing.assert_allclose(np.asarray(out_mask), np.asarray(mask))


def test_apply_always_augments_at_rate_one(rng):
    image, mask = _pair(rng)
    n_changed = 0
    for seed in range(8):
        out_img, _ = augment.apply_augmentations(
            jax.random.PRNGKey(seed), image, mask, prob_to_return_original=0.0)
        if not np.allclose(np.asarray(out_img), np.asarray(image)):
            n_changed += 1
    assert n_changed >= 7  # fliplr-only draw could be visually large anyway


def test_apply_deterministic_per_key(rng):
    image, mask = _pair(rng)
    key = jax.random.PRNGKey(42)
    a = augment.apply_augmentations(key, image, mask, 0.0)
    b = augment.apply_augmentations(key, image, mask, 0.0)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]))


def test_augment_batch_vmapped(rng):
    images = jnp.asarray(rng.random((4, H, W, 3)).astype(np.float32) * 255)
    fg = (rng.random((4, H, W)) > 0.5).astype(np.float32)
    masks = jnp.asarray(np.stack([1 - fg, fg], axis=-1))
    out_imgs, out_masks = jax.jit(
        lambda k, i, m: augment.augment_batch(k, i, m, 0.5)
    )(jax.random.PRNGKey(0), images, masks)
    assert out_imgs.shape == images.shape
    assert out_masks.shape == masks.shape
    assert np.isfinite(np.asarray(out_imgs)).all()


def test_split_expensive_composition_bit_identical():
    """The rotation-once composition must be bit-identical to the direct
    stage loop for the same draws (same perm/count/per-stage keys)."""
    from mliis_tpu.ops.augment import (AUG_FUNCS, _compose_split_expensive,
                                       _compose_stagewise, rotate_img_mask)
    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.integers(0, 256, (32, 32, 3)).astype(np.float32))
    fg = (rng.random((32, 32)) > 0.5).astype(np.float32)
    mask = jnp.stack([1.0 - fg, fg], axis=-1)
    n = len(AUG_FUNCS)
    exp_idx = list(AUG_FUNCS).index(rotate_img_mask)
    for seed in range(12):
        key = jax.random.PRNGKey(seed)
        k_perm, k_count, k_fns = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n)
        count = jax.random.randint(k_count, (), 1, n + 1)
        fn_keys = jax.random.split(k_fns, n)
        ref_i, ref_m = _compose_stagewise(perm, count, fn_keys, image, mask,
                                          AUG_FUNCS)
        new_i, new_m = _compose_split_expensive(perm, count, fn_keys, image,
                                                mask, AUG_FUNCS, exp_idx)
        # Same sequence, same keys; XLA float reassociation across the two
        # graph shapes leaves ~1e-5 relative noise (and the rare one-hot
        # boundary pixel flipping with it).
        np.testing.assert_allclose(np.asarray(ref_i), np.asarray(new_i),
                                   rtol=1e-3, atol=1e-2)
        mask_mismatch = np.mean(np.asarray(ref_m) != np.asarray(new_m))
        assert mask_mismatch < 0.005, mask_mismatch


def test_custom_unregistered_list_keeps_rotation_once():
    """A user-supplied aug_funcs list that is NOT in the planar registry
    (e.g. partial-wrapped members) but contains rotate_img_mask must still
    (a) dispatch through the rotation-once composition (not the
    all-branches-per-stage switch — the vmapped-switch pathology CLAUDE.md
    documents) and (b) match the direct stage loop for the same draws."""
    import functools
    from mliis_tpu.ops import augment
    from mliis_tpu.ops.augment import (_compose_split_expensive,
                                       _compose_stagewise, fliplr,
                                       rotate_img_mask, translate)

    wrapped_flip = functools.partial(fliplr)  # not in _PLANAR_CORES
    funcs = (wrapped_flip, rotate_img_mask, translate)
    assert augment._planar_cores_for(funcs) is None

    rng = np.random.default_rng(7)
    image = jnp.asarray(rng.integers(0, 256, (32, 32, 3)).astype(np.float32))
    fg = (rng.random((32, 32)) > 0.5).astype(np.float32)
    mask = jnp.stack([1.0 - fg, fg], axis=-1)
    n = len(funcs)
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        k_perm, k_count, k_fns = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n)
        count = jax.random.randint(k_count, (), 1, n + 1)
        fn_keys = jax.random.split(k_fns, n)
        ref_i, ref_m = _compose_stagewise(perm, count, fn_keys, image, mask,
                                          funcs)
        new_i, new_m = _compose_split_expensive(perm, count, fn_keys, image,
                                                mask, funcs, 1)
        np.testing.assert_allclose(np.asarray(ref_i), np.asarray(new_i),
                                   rtol=1e-3, atol=1e-2)
        mask_mismatch = np.mean(np.asarray(ref_m) != np.asarray(new_m))
        assert mask_mismatch < 0.005, mask_mismatch

    # End-to-end dispatch: apply_augmentations with the custom list traces
    # the rotation core exactly once (the rotation-once path), not once per
    # stage as the stagewise switch would.
    calls = []
    real_rotate = augment._rotate_planar

    def counting(*a, **kw):
        calls.append(1)
        return real_rotate(*a, **kw)

    augment._rotate_planar = counting
    try:
        out_i, out_m = augment.apply_augmentations(
            jax.random.PRNGKey(0), image, mask, 0.1, aug_funcs=funcs)
    finally:
        augment._rotate_planar = real_rotate
    assert out_i.shape == image.shape and out_m.shape == mask.shape
    assert len(calls) == 1, f"rotation traced {len(calls)}x, want once"
