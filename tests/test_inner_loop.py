"""Inner-loop engine tests: optimizer numerics vs. TF closed forms, loss
descent under scan, meta-learner update algebra."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       apply_optimizer, init_model_state,
                                       init_opt_state, make_adapt_fn,
                                       schedule_lrs)
from mliis_tpu.meta.learners import (MetaTrainConfig, apply_outer_update,
                                     make_chained_train_step,
                                     make_group_train_step,
                                     make_microbatched_train_step,
                                     make_per_task_fn, make_train_step,
                                     meta_step_size_schedule)
from mliis_tpu.meta import episodes
from mliis_tpu.ops import meta_math
from tests.tiny_model import TinySeg

IMG = 16


@pytest.fixture(scope="module")
def setup():
    store = make_synthetic_store(num_tasks=4, examples_per_task=10,
                                 image_size=IMG, seed=0)
    model = TinySeg()
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    return store, model, opt_cfg, state


def test_sgd_optimizer_closed_form():
    params = {"w": jnp.asarray([1.0, 2.0])}
    grads = {"w": jnp.asarray([0.5, -1.0])}
    opt_cfg = OptimizerConfig(name="sgd")
    new, _ = apply_optimizer(params, grads, init_opt_state(params, opt_cfg),
                             0.1, opt_cfg)
    np.testing.assert_allclose(np.asarray(new["w"]), [0.95, 2.1], rtol=1e-6)


def test_adam_beta1_zero_matches_tf_formula():
    """TF AdamOptimizer(beta1=0): v=b2*v+(1-b2)g^2;
    theta -= lr*sqrt(1-b2^t)*g/(sqrt(v)+eps)."""
    params = {"w": jnp.asarray([1.0])}
    g = 0.5
    grads = {"w": jnp.asarray([g])}
    opt_cfg = OptimizerConfig(name="adam", beta2=0.999, epsilon=1e-8)
    opt_state = init_opt_state(params, opt_cfg)
    w, v = 1.0, 0.0
    state = params
    for t in range(1, 4):
        state, opt_state = apply_optimizer(state, grads, opt_state, 0.01,
                                           opt_cfg)
        v = 0.999 * v + 0.001 * g * g
        lr_t = 0.01 * np.sqrt(1 - 0.999 ** t)
        w = w - lr_t * g / (np.sqrt(v) + 1e-8)
        np.testing.assert_allclose(float(state["w"][0]), w, rtol=1e-5)


def test_schedule_lrs():
    fixed = schedule_lrs("fixed", 0.1, 4)
    np.testing.assert_allclose(np.asarray(fixed), 0.1)
    cos = np.asarray(schedule_lrs("cosine_anneal", 0.1, 10))
    assert abs(cos[0] - 0.1) < 1e-6 and cos[-1] < cos[0]
    step = np.asarray(schedule_lrs("step_decay", 0.1, 12, decay_rate=0.5,
                                   decay_after_n_steps=5))
    np.testing.assert_allclose(step[:5], 0.1, rtol=1e-6)
    np.testing.assert_allclose(step[5:10], 0.05, rtol=1e-6)


def test_adapt_reduces_loss(setup):
    store, model, opt_cfg, state = setup
    adapt = make_adapt_fn(model, LossConfig(l2=False), opt_cfg, augment=False)
    imgs = jnp.asarray(store.images[0, :8])
    msks = jnp.asarray(store.masks[0, :8])
    idx = episodes.epoch_batch_indices(jax.random.PRNGKey(1), 8, 4, 20)
    keys = jax.random.split(jax.random.PRNGKey(2), 20)
    lrs = jnp.full((20,), 0.05, jnp.float32)
    final, losses = jax.jit(adapt)(state, imgs, msks, idx, keys, lrs)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-3:].mean() < losses[:3].mean()


def test_adapt_updates_batch_stats(setup):
    store, model, opt_cfg, state = setup
    adapt = make_adapt_fn(model, LossConfig(l2=False), opt_cfg, augment=False)
    imgs = jnp.asarray(store.images[0, :8])
    msks = jnp.asarray(store.masks[0, :8])
    idx = episodes.epoch_batch_indices(jax.random.PRNGKey(1), 8, 4, 3)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    lrs = jnp.full((3,), 0.01, jnp.float32)
    final, _ = adapt(state, imgs, msks, idx, keys, lrs)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(final.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_reptile_zero_meta_step_is_identity(setup):
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=2, foml=False, augment=False)
    step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg, cfg,
                                   n_max=10))
    out = step(state, jnp.asarray(store.images), jnp.asarray(store.masks),
               jnp.asarray(store.counts), jax.random.PRNGKey(0),
               jnp.float32(0.0), jnp.float32(0.01))
    for a, b in zip(jax.tree_util.tree_leaves(out.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_reptile_moves_toward_adapted(setup):
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=2, foml=False, augment=False)
    step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg, cfg,
                                   n_max=10))
    args = (jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(0))
    half = step(state, *args, jnp.float32(0.5), jnp.float32(0.01))
    full = step(state, *args, jnp.float32(1.0), jnp.float32(0.01))
    # interpolation linearity: theta_half == (theta + theta_full)/2
    for h, f, s in zip(jax.tree_util.tree_leaves(half.params),
                       jax.tree_util.tree_leaves(full.params),
                       jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(h),
                                   (np.asarray(f) + np.asarray(s)) / 2,
                                   atol=1e-6)


def test_fomaml_star_update_shape_and_motion(setup):
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=8, inner_batch_size=3, inner_iters=3,
                          meta_batch_size=2, foml=True, tail_shots=3,
                          augment=False)
    step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg, cfg,
                                   n_max=10))
    out = step(state, jnp.asarray(store.images), jnp.asarray(store.masks),
               jnp.asarray(store.counts), jax.random.PRNGKey(0),
               jnp.float32(0.1), jnp.float32(0.01))
    delta = meta_math.tree_dot(
        meta_math.tree_sub(out.params, state.params),
        meta_math.tree_sub(out.params, state.params))
    assert float(delta) > 0  # moved
    # zero meta step -> identity for FOMAML as well
    frozen = step(state, jnp.asarray(store.images), jnp.asarray(store.masks),
                  jnp.asarray(store.counts), jax.random.PRNGKey(0),
                  jnp.float32(0.0), jnp.float32(0.01))
    for a, b in zip(jax.tree_util.tree_leaves(frozen.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fomaml_single_step_equals_sgd_displacement(setup):
    """With inner_iters=1 and no tail, the FOMAML update is exactly the
    single SGD step displacement scaled by the meta step size."""
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=4, inner_batch_size=4, inner_iters=1,
                          meta_batch_size=1, foml=True, tail_shots=None,
                          augment=False, replacement=False)
    step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg, cfg,
                                   n_max=10))
    out = step(state, jnp.asarray(store.images), jnp.asarray(store.masks),
               jnp.asarray(store.counts), jax.random.PRNGKey(7),
               jnp.float32(1.0), jnp.float32(0.02))
    # With meta_step=1 and one task: theta_new = theta + (theta' - theta)
    # = theta', i.e. exactly one SGD step from theta. Verify it differs from
    # theta and that loss-gradient direction was followed (norm > 0).
    moved = meta_math.tree_dot(meta_math.tree_sub(out.params, state.params),
                               meta_math.tree_sub(out.params, state.params))
    assert float(moved) > 0


def test_fomaml_star_tail_uses_final_scheduled_lr(setup):
    """FOMAML*'s tail step (whose displacement IS the meta-update) must run
    at the LAST scheduled inner lr, not the raw initial lr. With
    inner_iters=2 and step_decay after 1 step, the pre-tail trajectory is
    identical across decay rates (both run one step at lr), so the
    meta-update must scale exactly with the decayed tail lr."""
    store, model, opt_cfg, state = setup
    outs = {}
    for rate in (0.5, 0.25):
        cfg = MetaTrainConfig(num_shots=8, inner_batch_size=3, inner_iters=2,
                              meta_batch_size=1, foml=True, tail_shots=3,
                              augment=False, lr_scheduler="step_decay",
                              lr_decay_rate=rate, lr_decay_after_n_steps=1)
        step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg,
                                       cfg, n_max=10))
        outs[rate] = step(state, jnp.asarray(store.images),
                          jnp.asarray(store.masks),
                          jnp.asarray(store.counts), jax.random.PRNGKey(3),
                          jnp.float32(1.0), jnp.float32(0.02))
    for a, b, s in zip(jax.tree_util.tree_leaves(outs[0.25].params),
                       jax.tree_util.tree_leaves(outs[0.5].params),
                       jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a) - np.asarray(s),
                                   0.5 * (np.asarray(b) - np.asarray(s)),
                                   atol=1e-6)


def test_group_step_unpadded_equals_train_step(setup):
    """A full group (num_real == group_size) is bit-identical to the plain
    train step with meta_batch_size == group_size: same task sampling, same
    per-task adaptation, and the weighted mean degenerates to the mean."""
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=2, foml=False, augment=False)
    plain = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg,
                                    cfg, n_max=10))
    group = jax.jit(make_group_train_step(model, LossConfig(l2=False),
                                          opt_cfg, cfg, n_max=10,
                                          group_size=2))
    args = (jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(3),
            jnp.float32(0.3), jnp.float32(0.01))
    a = plain(state, *args)
    b = group(state, *args, jnp.float32(2.0))
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_group_step_padded_slot_carries_zero_weight(setup):
    """With num_real=1 of group_size=2, the result must equal the outer
    update computed from slot 0's per-task update alone (white-box replay of
    the group step's sampling)."""
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=2, foml=False, augment=False)
    group = jax.jit(make_group_train_step(model, LossConfig(l2=False),
                                          opt_cfg, cfg, n_max=10,
                                          group_size=2))
    key = jax.random.PRNGKey(9)
    eps, lr = jnp.float32(0.4), jnp.float32(0.01)
    out = group(state, jnp.asarray(store.images), jnp.asarray(store.masks),
                jnp.asarray(store.counts), key, eps, lr, jnp.float32(1.0))

    # Replay slot 0 by hand.
    k_tasks, k_inner = jax.random.split(key)
    task_ids = episodes.slot_task_ids(k_tasks, store.num_tasks, 2)
    task_keys = episodes.slot_keys(k_inner, 2)
    per_task = make_per_task_fn(model, LossConfig(l2=False), opt_cfg, cfg,
                                n_max=10)
    imgs = jnp.asarray(store.images)[task_ids[0]]
    msks = jnp.asarray(store.masks)[task_ids[0]]
    cnt = jnp.asarray(store.counts)[task_ids[0]]
    update0, _ = jax.jit(per_task)(state, imgs, msks, cnt, task_keys[0], lr)
    expected = apply_outer_update(state, update0, eps, cfg.foml)
    for x, y in zip(jax.tree_util.tree_leaves(out.params),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.parametrize("pad_tail", [False, True])
def test_microbatched_ragged_tail(setup, pad_tail):
    """meta_batch=3 in groups of 2 (2+1 tail, exact-size or padded
    programs): identity at zero meta step, deterministic, finite — and
    FOMAML* variant runs too."""
    store, model, opt_cfg, state = setup
    for foml, tail in ((False, None), (True, 3)):
        cfg = MetaTrainConfig(num_shots=8, inner_batch_size=3, inner_iters=2,
                              meta_batch_size=3, foml=foml, tail_shots=tail,
                              augment=False)
        step = make_microbatched_train_step(model, LossConfig(l2=False),
                                            opt_cfg, cfg, n_max=10,
                                            group_size=2, pad_tail=pad_tail)
        args = (jnp.asarray(store.images), jnp.asarray(store.masks),
                jnp.asarray(store.counts), jax.random.PRNGKey(11))
        frozen = step(state, *args, jnp.float32(0.0), jnp.float32(0.01))
        for a, b in zip(jax.tree_util.tree_leaves(frozen.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        x = step(state, *args, jnp.float32(0.2), jnp.float32(0.01))
        y = step(state, *args, jnp.float32(0.2), jnp.float32(0.01))
        for a, b in zip(jax.tree_util.tree_leaves(x.params),
                        jax.tree_util.tree_leaves(y.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert np.isfinite(np.asarray(a)).all()


def test_microbatched_pad_modes_agree(setup):
    """Exact-size and padded-tail programs sample identical episodes (slot
    keying) and must produce the same meta-step result."""
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=3, foml=False, augment=False)
    exact = make_microbatched_train_step(model, LossConfig(l2=False),
                                         opt_cfg, cfg, n_max=10,
                                         group_size=2, pad_tail=False)
    padded = make_microbatched_train_step(model, LossConfig(l2=False),
                                          opt_cfg, cfg, n_max=10,
                                          group_size=2, pad_tail=True)
    args = (jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(13),
            jnp.float32(0.2), jnp.float32(0.01))
    a = exact(state, *args)
    b = padded(state, *args)
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("foml,tail", [(False, None), (True, 2)])
def test_chained_step_matches_plain(setup, foml, tail):
    """The scan-over-slots chained step draws the same slot-keyed episodes
    as the vmapped plain step, so params, BN stats, and optimizer slots must
    agree (only the mean's reduction order differs)."""
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=3, foml=foml, tail_shots=tail,
                          augment=False)
    plain = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg,
                                    cfg, n_max=10))
    chained = jax.jit(make_chained_train_step(model, LossConfig(l2=False),
                                              opt_cfg, cfg, n_max=10))
    args = (jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(17),
            jnp.float32(0.3), jnp.float32(0.01))
    a = plain(state, *args)
    b = chained(state, *args)
    for tree_a, tree_b in ((a.params, b.params),
                           (a.batch_stats, b.batch_stats),
                           (a.opt.v, b.opt.v)):
        for x, y in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
    assert int(a.opt.step) == int(b.opt.step)


def test_meta_step_size_schedule():
    assert meta_step_size_schedule(0, 100, 0.1, 0.0) == pytest.approx(0.1)
    assert meta_step_size_schedule(50, 100, 0.1, 0.0) == pytest.approx(0.05)
    assert meta_step_size_schedule(100, 100, 0.1, 1e-5) == pytest.approx(1e-5)


def test_train_step_deterministic(setup):
    store, model, opt_cfg, state = setup
    cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                          meta_batch_size=2, foml=False, augment=True)
    step = jax.jit(make_train_step(model, LossConfig(l2=False), opt_cfg, cfg,
                                   n_max=10))
    args = (jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(5),
            jnp.float32(0.2), jnp.float32(0.01))
    a = step(state, *args)
    b = step(state, *args)
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_jit_init_matches_eager_init():
    """jit_init=True (one cacheable CPU program, used by bench/TPU sessions)
    must produce the same state as eager init: same tree, same seed-derived
    values (fusion may reorder the normal transform by ~1 ulp), and the
    int-seed form must equal the explicit-key form exactly."""
    model = TinySeg()
    opt_cfg = OptimizerConfig(name="adam")
    eager = init_model_state(model, jax.random.PRNGKey(3), IMG, opt_cfg)
    jitted = init_model_state(model, 3, IMG, opt_cfg, jit_init=True)
    jitted_key = init_model_state(model, jax.random.PRNGKey(3), IMG, opt_cfg,
                                  jit_init=True)
    e_leaves = jax.tree_util.tree_leaves(eager)
    j_leaves = jax.tree_util.tree_leaves(jitted)
    k_leaves = jax.tree_util.tree_leaves(jitted_key)
    assert len(e_leaves) == len(j_leaves) == len(k_leaves)
    assert (jax.tree_util.tree_structure(eager)
            == jax.tree_util.tree_structure(jitted))
    for e, j, k in zip(e_leaves, j_leaves, k_leaves):
        np.testing.assert_array_equal(np.asarray(j), np.asarray(k))
        np.testing.assert_allclose(np.asarray(e, np.float64),
                                   np.asarray(j, np.float64),
                                   rtol=1e-6, atol=1e-7)
