"""EarlyStopper port parity, trace walking, GP optimizer convergence, and
the early-stopping evaluation + UHO drivers on the tiny model."""
import jax
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.early_stopping import EarlyStopper, walk_trace
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state)
from mliis_tpu.meta.uho import (Dimension, GPOptimizer,
                                compute_best_configuration,
                                gp_update_hyperparameter_optimization)
from mliis_tpu.meta.uho_eval import (EarlyStoppingEvaluator,
                                     optimize_update_hyperparams)
from tests.tiny_model import TinySeg


# --- EarlyStopper behavioral parity (hyperparam_search.py:24-68) ---

def test_early_stopper_tracks_best():
    s = EarlyStopper(patience=2)
    metrics = [0.1, 0.3, 0.2, 0.25, 0.24]
    cont = [s.continue_training(m, i + 1) for i, m in enumerate(metrics)]
    assert all(cont[:4])
    assert s.best_metric() == 0.3
    assert s.best_num_steps() == 2


def test_early_stopper_stops_after_patience():
    s = EarlyStopper(patience=1)
    assert s.continue_training(0.5, 1)
    assert s.continue_training(0.4, 2)   # 1 without improving
    assert not s.continue_training(0.3, 3)  # patience exceeded


def test_early_stopper_min_steps_floor():
    s = EarlyStopper(patience=0, min_steps=3)
    # While under min_steps, always continue and overwrite best metric.
    assert s.continue_training(0.9, 1)
    assert s.continue_training(0.1, 2)
    assert s.continue_training(0.2, 3)
    assert s.best_num_steps() == 3
    assert s.continue_training(0.3, 4)
    assert s.best_num_steps() == 4


def test_walk_trace_matches_live_stopper():
    trace = [0.1, 0.5, 0.4, 0.45, 0.44, 0.43, 0.42, 0.9]
    steps, best = walk_trace(trace, patience=2, min_steps=0)
    # stops after 3 non-improving steps (patience=2 exceeded at step 6)
    assert steps == 2 and best == 0.5


# --- GP optimizer ---

def test_dimension_log_uniform_roundtrip():
    d = Dimension(1e-4, 1e-1, "lr")
    for v in (1e-4, 1e-3, 1e-1):
        assert abs(d.from_transformed(np.log(v)) - v) < 1e-12
    assert d.from_unit(0.0) == pytest.approx(1e-4)
    assert d.from_unit(1.0) == pytest.approx(1e-1)


def test_dimension_integer():
    d = Dimension(4, 16, "batch", is_integer=True, prior="uniform")
    vals = {d.sample(np.random.default_rng(i)) for i in range(50)}
    assert all(isinstance(v, int) and 4 <= v <= 16 for v in vals)


def test_gp_optimizer_finds_minimum():
    """EI search on a smooth 1-d bowl must beat random search."""
    d = Dimension(1e-3, 1.0, "x")
    opt = GPOptimizer([d], n_initial_points=5, seed=0)
    target = 0.05
    best = np.inf
    for _ in range(25):
        (x,) = opt.ask()
        y = (np.log(x) - np.log(target)) ** 2
        best = min(best, y)
        opt.tell([x], y)
    assert best < 0.1  # within a factor ~1.4 of the optimum in log space


def test_compute_best_configuration_median_steps():
    results = [
        ({"lr": 0.1}, (["a", "b"], [10, 20], [0.5, 0.6])),
        ({"lr": 0.2}, (["a", "b", "c"], [5, 7, 9], [0.8, 0.9, 0.7])),
    ]
    config, steps, metric = compute_best_configuration(results)
    assert config == {"lr": 0.2}
    assert steps == 7
    assert metric == pytest.approx(0.8)


def test_gp_search_driver_csv(tmp_path):
    calls = []

    def eval_fn(lr=None, **kw):
        calls.append(lr)
        return ["t1"], [3], [1.0 - (np.log10(lr) + 2) ** 2]  # peak at 1e-2

    path = str(tmp_path / "results.csv")
    config, steps, metric, results = gp_update_hyperparameter_optimization(
        eval_fn, {"lr": None}, {"lr": [1e-4, 1e-1]}, n=8,
        save_results_to=path, log_fn=lambda *a: None)
    assert len(results) == 8
    assert steps == 3
    import pandas as pd
    df = pd.read_csv(path)
    assert len(df) == 8
    assert "lr" in df.columns and "best_num_steps" in df.columns


# --- Early-stopping eval + UHO end-to-end on the tiny model ---

IMG = 16


@pytest.fixture(scope="module")
def es_setup():
    store = make_synthetic_store(num_tasks=3, examples_per_task=10,
                                 image_size=IMG, seed=0)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    ev = EarlyStoppingEvaluator(model, loss_cfg, opt_cfg, store,
                                num_shots=5, test_shots=5, augment=False,
                                patience=3, task_chunk_size=3)
    return ev, state


def test_evaluate_with_early_stopping(es_setup):
    ev, state = es_setup
    names, steps, ious = ev.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(1), min_steps=1, max_steps=8,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    assert len(names) == len(steps) == len(ious) == 3
    assert all(1 <= s <= 8 for s in steps)
    assert all(0.0 <= i <= 1.0 for i in ious)


def test_evaluate_with_fixed_steps_skips_trace(es_setup):
    ev, state = es_setup
    names, steps, ious = ev.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(1), min_steps=2, max_steps=2,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    assert steps == [2, 2, 2]
    assert len(ious) == 3  # re-evaluated at the fixed step count


def test_optimize_update_hyperparams_driver(es_setup, tmp_path):
    ev, state = es_setup
    best_lr, best_steps = optimize_update_hyperparams(
        ev, state, jax.random.PRNGKey(2), min_steps=1, max_steps=4,
        num_configs_to_sample=3, lr_search_range_low=0.001,
        lr_search_range_high=0.1, save_dir=str(tmp_path),
        log_fn=lambda *a: None)
    assert 0.001 <= best_lr <= 0.1
    assert 1 <= best_steps <= 4
    import glob
    assert glob.glob(str(tmp_path / "*.csv"))


def test_early_stopping_chained_matches_vmapped(es_setup):
    """chain_chunk (lax.map traces) must reproduce the vmapped evaluator's
    step counts and IoUs for identical keys."""
    ev, state = es_setup
    chained = EarlyStoppingEvaluator(ev.model, ev.loss_config, ev.opt_config,
                                     ev.store, num_shots=5, test_shots=5,
                                     augment=False, patience=3,
                                     task_chunk_size=3, chain_chunk=True)
    a = ev.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(9), min_steps=1, max_steps=6,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    b = chained.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(9), min_steps=1, max_steps=6,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    assert a[0] == b[0]
    assert a[1] == b[1]
    np.testing.assert_allclose(a[2], b[2], atol=1e-5)


def test_early_stopping_mesh_matches_unsharded(es_setup):
    """Mesh-sharded early-stopping traces must match the unsharded ones for
    identical keys (same per-task kernel, tasks split across devices)."""
    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.parallel.mesh import make_task_mesh
    ev, state = es_setup
    store = make_synthetic_store(num_tasks=4, examples_per_task=10,
                                 image_size=IMG, seed=5)
    plain = EarlyStoppingEvaluator(ev.model, ev.loss_config, ev.opt_config,
                                   store, num_shots=5, test_shots=5,
                                   augment=False, patience=3,
                                   task_chunk_size=4)
    meshed = EarlyStoppingEvaluator(ev.model, ev.loss_config, ev.opt_config,
                                    store, num_shots=5, test_shots=5,
                                    augment=False, patience=3,
                                    task_chunk_size=4,
                                    mesh=make_task_mesh(4))
    assert meshed.task_chunk_size == 4
    a = plain.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(9), min_steps=1, max_steps=6,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    b = meshed.evaluate_with_early_stopping(
        state, jax.random.PRNGKey(9), min_steps=1, max_steps=6,
        inner_batch_size=4, lr=0.02, eval_all_tasks=True)
    assert a[0] == b[0]
    assert a[1] == b[1]
    np.testing.assert_allclose(a[2], b[2], atol=1e-5)


def test_trace_kernel_cache_is_per_instance(es_setup):
    """The trace-kernel cache lives on the instance: same-shape calls reuse
    the compiled kernel, a second evaluator gets its own cache, and a
    discarded evaluator is garbage-collectable (a functools.lru_cache on
    the method would pin `self` in a class-level cache)."""
    import gc
    import weakref
    ev, _ = es_setup
    k1 = ev._trace_kernel(4, 2)
    assert ev._trace_kernel(4, 2) is k1
    other = EarlyStoppingEvaluator(ev.model, ev.loss_config, ev.opt_config,
                                   ev.store, num_shots=5, test_shots=5,
                                   augment=False, patience=3,
                                   task_chunk_size=3)
    assert (4, 2) not in other._trace_cache
    other._trace_kernel(4, 2)
    ref = weakref.ref(other)
    del other
    gc.collect()
    assert ref() is None, "discarded evaluator stayed pinned"
