"""Episode sampling tests: without-replacement epoch cycling, support/query
disjointness, one-hot mask conversion, shot sampling validity."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mliis_tpu.meta import episodes


def test_onehot_mask_channels_sum_to_one(rng):
    m = jnp.asarray((rng.random((4, 8, 8)) > 0.5).astype(np.uint8) * 255)
    onehot = episodes.onehot_mask(m)
    assert onehot.shape == (4, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(onehot.sum(-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(onehot[..., 1]),
                               np.asarray(m) / 255.0)


def test_epoch_batches_cycle_without_replacement():
    n, batch, steps = 5, 4, 10
    idx = episodes.epoch_batch_indices(jax.random.PRNGKey(0), n, batch, steps)
    assert idx.shape == (steps, batch)
    flat = np.asarray(idx).reshape(-1)
    # Concatenated permutations: every window of n indices is a permutation.
    for start in range(0, len(flat) - n + 1, n):
        window = flat[start:start + n]
        assert sorted(window) == list(range(n))


def test_replacement_batches_distinct_within_batch():
    idx = episodes.replacement_batch_indices(jax.random.PRNGKey(1), 6, 4, 20)
    arr = np.asarray(idx)
    for row in arr:
        assert len(set(row.tolist())) == len(row)


def test_split_support_query_disjoint_partition():
    support, query = episodes.split_support_query(jax.random.PRNGKey(2), 10, 4)
    s, q = set(np.asarray(support).tolist()), set(np.asarray(query).tolist())
    assert len(s) == 6 and len(q) == 4
    assert s | q == set(range(10))
    assert not (s & q)


def test_split_is_shuffled():
    """Different keys must yield different splits (shuffle_before_split)."""
    splits = set()
    for seed in range(8):
        _, query = episodes.split_support_query(jax.random.PRNGKey(seed), 10, 5)
        splits.add(tuple(sorted(np.asarray(query).tolist())))
    assert len(splits) > 1


def test_sample_shot_indices_respects_count():
    """Only indices < count are sampled when count >= num_shots."""
    for seed in range(5):
        idx = episodes.sample_shot_indices(jax.random.PRNGKey(seed),
                                           jnp.int32(7), 5, 10)
        arr = np.asarray(idx)
        assert (arr < 7).all()
        assert len(set(arr.tolist())) == 5  # distinct


def test_sample_shot_indices_clipped_task():
    """count < num_shots: indices stay valid (repeats allowed)."""
    idx = episodes.sample_shot_indices(jax.random.PRNGKey(0), jnp.int32(3),
                                       5, 10)
    arr = np.asarray(idx)
    assert (arr < 3).all()


def test_sample_task_ids_in_range():
    ids = episodes.sample_task_ids(jax.random.PRNGKey(3), 16, 5)
    arr = np.asarray(ids)
    assert arr.shape == (5,)
    assert ((arr >= 0) & (arr < 16)).all()


def test_replacement_batch_wider_than_pool_raises():
    """random.sample semantics (metaseg.py:276): replacement batches wider
    than the pool are an error, not a silent truncation; the epoch sampler
    cycles instead."""
    from mliis_tpu.meta.episodes import batch_indices
    with pytest.raises(ValueError, match="batch_size"):
        batch_indices(jax.random.PRNGKey(0), 5, 8, 3, replacement=True)
    idx = batch_indices(jax.random.PRNGKey(0), 5, 8, 3, replacement=False)
    assert idx.shape == (3, 8) and int(idx.max()) < 5
