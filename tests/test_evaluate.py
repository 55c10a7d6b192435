"""Evaluation-engine tests: chunked vmapped eval, state immutability
(_full_state snapshot/restore equivalence), adaptation actually helps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.evaluate import (EvalConfig, GeckoEvaluator,
                                     evaluate_gecko)
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state)
from tests.tiny_model import TinySeg

IMG = 16


@pytest.fixture(scope="module")
def setup():
    store = make_synthetic_store(num_tasks=5, examples_per_task=10,
                                 image_size=IMG, seed=0)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    return store, model, loss_cfg, opt_cfg, state


def test_evaluate_all_tasks(setup):
    store, model, loss_cfg, opt_cfg, state = setup
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=3, task_chunk_size=2)
    ev = GeckoEvaluator(model, loss_cfg, opt_cfg, cfg, store)
    miou, task_map = ev.evaluate(state, jax.random.PRNGKey(1), lr=0.01,
                                 eval_all_tasks=True)
    assert len(task_map) == store.num_tasks
    assert 0.0 <= miou <= 1.0
    assert set(task_map) == set(store.names)


def test_evaluate_subsample(setup):
    store, model, loss_cfg, opt_cfg, state = setup
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=2, task_chunk_size=2)
    ev = GeckoEvaluator(model, loss_cfg, opt_cfg, cfg, store)
    _, task_map = ev.evaluate(state, jax.random.PRNGKey(1), lr=0.01,
                              eval_all_tasks=False, num_tasks_to_sample=2)
    assert len(task_map) == 2


def test_chained_chunk_matches_vmapped(setup):
    """chain_chunk (lax.map over the chunk) must reproduce the vmapped
    chunk's per-task IoUs: the per-task math is identical, only the batching
    strategy differs."""
    store, model, loss_cfg, opt_cfg, state = setup
    base = dict(num_shots=5, test_shots=5, inner_batch_size=4, inner_iters=3,
                task_chunk_size=3)
    ev_vmap = GeckoEvaluator(model, loss_cfg, opt_cfg,
                             EvalConfig(chain_chunk=False, **base), store)
    ev_chain = GeckoEvaluator(model, loss_cfg, opt_cfg,
                              EvalConfig(chain_chunk=True, **base), store)
    idx = list(range(store.num_tasks))
    a = ev_vmap.evaluate_tasks(state, idx, jax.random.PRNGKey(5), 0.01)
    b = ev_chain.evaluate_tasks(state, idx, jax.random.PRNGKey(5), 0.01)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_state_is_never_mutated(setup):
    """The pure-functional analogue of _full_state export/import: evaluating
    must leave the caller's state bit-identical."""
    store, model, loss_cfg, opt_cfg, state = setup
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    state.params)
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=2, task_chunk_size=2)
    ev = GeckoEvaluator(model, loss_cfg, opt_cfg, cfg, store)
    ev.evaluate(state, jax.random.PRNGKey(1), lr=0.05, eval_all_tasks=True)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptation_improves_over_no_adaptation(setup):
    """More adaptation steps at a sane LR must beat near-zero adaptation on
    learnable synthetic tasks (the core few-shot capability)."""
    store, model, loss_cfg, opt_cfg, state = setup
    base_cfg = dict(num_shots=5, test_shots=5, inner_batch_size=4,
                    task_chunk_size=5, augment=False)
    ev_none = GeckoEvaluator(model, loss_cfg, opt_cfg,
                             EvalConfig(inner_iters=1, **base_cfg), store)
    ev_many = GeckoEvaluator(model, loss_cfg, opt_cfg,
                             EvalConfig(inner_iters=40, **base_cfg), store)
    miou_none, _ = ev_none.evaluate(state, jax.random.PRNGKey(2), lr=1e-6,
                                    eval_all_tasks=True, aug_rate=None)
    miou_many, _ = ev_many.evaluate(state, jax.random.PRNGKey(2), lr=0.05,
                                    eval_all_tasks=True, aug_rate=None)
    assert miou_many > miou_none + 0.05


def test_evaluate_gecko_multi_sample_driver(setup):
    store, model, loss_cfg, opt_cfg, state = setup
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=2, task_chunk_size=5)
    ev = GeckoEvaluator(model, loss_cfg, opt_cfg, cfg, store)
    logs = []
    miou, task_map = evaluate_gecko(ev, state, jax.random.PRNGKey(3), lr=0.01,
                                    num_samples=2,
                                    serially_eval_all_tasks=True,
                                    log_fn=logs.append)
    assert all(len(v) == 2 for v in task_map.values())
    assert any("95% CI" in line for line in logs)
    assert 0.0 <= miou <= 1.0


def test_device_store_cache_no_id_aliasing():
    """Regression: the device-array cache must never serve one store's
    arrays for another. The old id()-keyed module cache aliased when ids
    were recycled across GC'd throwaway stores (kshot.py's per-task subset
    loop); per-instance caching makes aliasing structurally impossible."""
    import gc
    from mliis_tpu.meta.evaluate import device_store_arrays
    base = make_synthetic_store(num_tasks=6, examples_per_task=4,
                                image_size=8, seed=3)
    for i in range(base.num_tasks):
        sub = base.subset([i])
        imgs, msks, cnts = device_store_arrays(sub)
        np.testing.assert_array_equal(np.asarray(imgs), sub.images)
        np.testing.assert_array_equal(np.asarray(msks), sub.masks)
        np.testing.assert_array_equal(np.asarray(cnts), sub.counts)
        # Cache hit returns the identical arrays (no re-upload).
        again = device_store_arrays(sub)
        assert again[0] is imgs
        del sub, imgs, msks, cnts, again
        gc.collect()  # force id reuse pressure between iterations


def test_export_path_probs_equal_eval_path(setup):
    """The artifact-export kernel and the IoU eval path share ONE protocol
    function (make_adapt_and_predict_fn): for the same key, the export
    path's query probabilities must reproduce the eval path's per-image
    IoUs exactly (VERDICT r4 weak #3 — a protocol change applied to one
    path but not the other would skew exported artifacts vs reported
    numbers)."""
    from mliis_tpu.meta.evaluate import (make_adapt_and_predict_fn,
                                         make_eval_task_fn)
    from mliis_tpu.ops.metrics import batched_hard_iou

    store, model, loss_cfg, opt_cfg, state = setup
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=3, task_chunk_size=1)
    n_max = store.images.shape[1]
    eval_task = jax.jit(make_eval_task_fn(model, loss_cfg, opt_cfg, cfg,
                                          n_max))
    core = jax.jit(make_adapt_and_predict_fn(model, loss_cfg, opt_cfg, cfg,
                                             n_max))
    task_args = (jnp.asarray(store.images[0]), jnp.asarray(store.masks[0]),
                 jnp.asarray(store.counts[0]))
    key = jax.random.PRNGKey(17)
    common = (state,) + task_args + (key, jnp.float32(0.01), jnp.float32(0.0),
                                     jnp.float32(0.5))
    ious = np.asarray(eval_task(*common))
    _, _, query_masks, probs = core(*common)
    preds = (np.asarray(probs) > 0.5).astype(np.float32)
    recomputed = np.asarray(batched_hard_iou(jnp.asarray(preds), query_masks))
    np.testing.assert_allclose(ious, recomputed, atol=1e-6)

    # The evaluator's export kernel is a jit of the same core.
    ev = GeckoEvaluator(model, loss_cfg, opt_cfg, cfg, store)
    kernel = ev._adapt_task_kernel(model, loss_cfg, opt_cfg)
    _, _, kernel_probs = kernel(*common)
    np.testing.assert_allclose(np.asarray(kernel_probs), np.asarray(probs),
                               atol=1e-6)
