"""Meta-training learning-curve regression tests.

The reference's recipe provably converges (run.sh -> ~0.87 FSS-1000 mIoU);
with the dataset and checkpoint stripped from this environment, learning
must be proven at reachable scale: meta-train TinySeg on synthetic tasks and
assert held-out adaptation IoU improves substantially over the init state.
An outer-update sign flip, broken BN-state averaging, or a corrupted
meta-batch average fails these tests, where single-step algebra tests would
pass. Calibration data: experiments/bn_threading_delta.json (init ~0.25,
iter-50 eval IoU ~0.64 at these hyperparameters).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state)
from mliis_tpu.meta.learners import (MetaTrainConfig,
                                     make_chained_train_step,
                                     make_train_step)
from tests.tiny_model import TinySeg

IMG = 16
LR = 0.01
META_STEP = 0.2
# FOMAML's update is the last inner step's displacement (tiny next to
# Reptile's interpolation toward the adapted params), so the toy-scale foml
# tests use a larger meta step (calibrated: init ~0.16 -> ~0.5 at 30 iters,
# ~0.65 at 60).
FOML_META_STEP = 1.0
MIN_IMPROVEMENT = 0.15


def _setup(**cfg_overrides):
    store = make_synthetic_store(num_tasks=12, examples_per_task=10,
                                 image_size=IMG, seed=0)
    test_store = make_synthetic_store(num_tasks=6, examples_per_task=10,
                                      image_size=IMG, seed=99)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="adam")
    cfg_kwargs = dict(num_shots=6, inner_batch_size=4, inner_iters=6,
                      meta_batch_size=4, foml=False, augment=False)
    cfg_kwargs.update(cfg_overrides)
    cfg = MetaTrainConfig(**cfg_kwargs)
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    evaluator = GeckoEvaluator(
        model, loss_cfg, opt_cfg,
        EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                   inner_iters=8, augment=False, task_chunk_size=6),
        test_store)
    return store, model, loss_cfg, opt_cfg, cfg, state, evaluator


def _run_curve(train_step, state, store, evaluator, meta_iters: int,
               eval_iters, prepare_state=lambda s: s, meta_step=META_STEP):
    imgs, msks, cnts = (jnp.asarray(store.images), jnp.asarray(store.masks),
                        jnp.asarray(store.counts))
    key = jax.random.PRNGKey(7)
    init_iou, _ = evaluator.evaluate(state, jax.random.PRNGKey(1000), lr=LR,
                                     eval_all_tasks=True, aug_rate=None)
    evals = []
    for i in range(meta_iters):
        key, k_step = jax.random.split(key)
        state = train_step(prepare_state(state), imgs, msks, cnts, k_step,
                           jnp.float32(meta_step), jnp.float32(LR))
        if (i + 1) in eval_iters:
            iou, _ = evaluator.evaluate(state, jax.random.PRNGKey(2000 + i),
                                        lr=LR, eval_all_tasks=True,
                                        aug_rate=None)
            evals.append(float(iou))
    return float(init_iou), evals


@pytest.mark.slow
def test_meta_training_learns_plain():
    store, model, loss_cfg, opt_cfg, cfg, state, evaluator = _setup()
    train_step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, cfg,
                                         n_max=10))
    init_iou, evals = _run_curve(train_step, state, store, evaluator,
                                 meta_iters=80, eval_iters={50, 65, 80})
    assert max(evals) - init_iou >= MIN_IMPROVEMENT, \
        "meta-training did not learn: init {} evals {}".format(init_iou,
                                                               evals)


@pytest.mark.slow
def test_meta_training_learns_fomaml_star():
    """FOMAML* (the run.sh flagship algorithm: last-step displacement on a
    disjoint un-augmented tail batch, reptile.py:605-663) must LEARN, not
    just satisfy single-step algebra identities — a displacement-sign or
    tail-batch regression that preserves those identities fails here."""
    store, model, loss_cfg, opt_cfg, cfg, state, evaluator = _setup(
        foml=True, tail_shots=2)
    train_step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, cfg,
                                         n_max=10))
    init_iou, evals = _run_curve(train_step, state, store, evaluator,
                                 meta_iters=60, eval_iters={30, 45, 60},
                                 meta_step=FOML_META_STEP)
    assert max(evals) - init_iou >= MIN_IMPROVEMENT, \
        "FOMAML* meta-training did not learn: init {} evals {}".format(
            init_iou, evals)


@pytest.mark.slow
def test_meta_training_learns_chained_fomaml_star():
    """The chained single-launch step (--chain_tasks, the bench.py default
    path) must learn with the same curve as the vmapped step (slot-keyed
    draws make them draw-identical; calibration showed matching evals)."""
    store, model, loss_cfg, opt_cfg, cfg, state, evaluator = _setup(
        foml=True, tail_shots=2)
    train_step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg,
                                                 cfg, n_max=10))
    init_iou, evals = _run_curve(train_step, state, store, evaluator,
                                 meta_iters=60, eval_iters={30, 45, 60},
                                 meta_step=FOML_META_STEP)
    assert max(evals) - init_iou >= MIN_IMPROVEMENT, \
        "chained FOMAML* meta-training did not learn: init {} evals {}".format(
            init_iou, evals)


@pytest.mark.slow
def test_meta_training_learns_mesh_sharded():
    """The --mesh_tasks execution strategy must also learn (not just match
    one step of the plain path numerically)."""
    from mliis_tpu.parallel.mesh import (make_sharded_train_step,
                                         make_task_mesh, replicate_to_mesh)
    store, model, loss_cfg, opt_cfg, cfg, state, evaluator = _setup()
    mesh = make_task_mesh(8)
    train_step = make_sharded_train_step(model, loss_cfg, opt_cfg, cfg,
                                         n_max=10, mesh=mesh)
    # Donation-safe owned copy each step (the sharded step donates arg 0).
    prepare = lambda s: replicate_to_mesh(  # noqa: E731
        jax.tree_util.tree_map(jnp.array, s), mesh)
    init_iou, evals = _run_curve(train_step, state, store, evaluator,
                                 meta_iters=80, eval_iters={50, 65, 80},
                                 prepare_state=prepare)
    assert max(evals) - init_iou >= MIN_IMPROVEMENT, \
        "sharded meta-training did not learn: init {} evals {}".format(
            init_iou, evals)
