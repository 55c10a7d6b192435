"""train_gecko driver-level tests: mesh-sharded vs unsharded parity and
loop-level behavior (checkpoints, metrics, deadline) on the 8-device CPU
mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state)
from mliis_tpu.meta.learners import MetaTrainConfig
from mliis_tpu.meta.train import TrainLoopConfig, train_gecko
from tests.tiny_model import TinySeg

IMG = 16


@pytest.fixture(scope="module")
def setup():
    train = make_synthetic_store(num_tasks=6, examples_per_task=10,
                                 image_size=IMG, seed=0)
    test = make_synthetic_store(num_tasks=4, examples_per_task=10,
                                image_size=IMG, seed=1)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    return train, test, model, loss_cfg, opt_cfg, state


def _fresh(state):
    return jax.tree_util.tree_map(jnp.array, state)


def _run(setup, tmp_path, tag, **loop_kwargs):
    train, test, model, loss_cfg, opt_cfg, state = setup
    meta_cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3, inner_iters=2,
                               meta_batch_size=3, foml=False, augment=False)
    loop_cfg = TrainLoopConfig(meta_iters=3, meta_step_size=0.3,
                               meta_step_size_final=0.1, eval_interval=2,
                               eval_inner_batch_size=3, eval_inner_iters=2,
                               num_eval_shots=5, num_tasks_to_eval=2,
                               save_checkpoint_every_n_meta_iters=2,
                               lr=0.01, **loop_kwargs)
    save_dir = os.path.join(str(tmp_path), tag)
    logs = []
    out = train_gecko(model, _fresh(state), train, test, save_dir, loss_cfg,
                      opt_cfg, meta_cfg, loop_cfg, jax.random.PRNGKey(7),
                      log_fn=logs.append, eval_task_chunk_size=2)
    return out, save_dir, logs


def test_train_gecko_mesh_matches_unsharded(setup, tmp_path):
    """3 meta-iters with --mesh_tasks 8 vs the single-device step under the
    same key chain: slot-indexed sampling makes the final params match (up
    to psum reduction order)."""
    plain, plain_dir, plain_logs = _run(setup, tmp_path, "plain")
    mesh, mesh_dir, mesh_logs = _run(setup, tmp_path, "mesh", mesh_tasks=8)
    for a, b in zip(jax.tree_util.tree_leaves(plain.params),
                    jax.tree_util.tree_leaves(mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # Loop-level artifacts from both runs.
    for d, logs in ((plain_dir, plain_logs), (mesh_dir, mesh_logs)):
        assert any("Train step" in str(line) for line in logs)
        assert os.path.exists(d)
        assert any(name.startswith("ckpt") or "checkpoint" in name.lower()
                   for name in os.listdir(d)), os.listdir(d)


def test_train_gecko_microbatched_runs(setup, tmp_path):
    out, save_dir, logs = _run(setup, tmp_path, "micro", task_group_size=2)
    for leaf in jax.tree_util.tree_leaves(out.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_gecko_chained_matches_plain(setup, tmp_path):
    """--chain_tasks runs the same slot-keyed episodes inside one launch, so
    3 driver iterations must land on the plain step's params."""
    plain, _, _ = _run(setup, tmp_path, "plain2")
    chained, _, logs = _run(setup, tmp_path, "chained", chain_tasks=True)
    for a, b in zip(jax.tree_util.tree_leaves(plain.params),
                    jax.tree_util.tree_leaves(chained.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    assert any("Train step" in str(line) for line in logs)


def test_interval_evaluators_inherit_training_protocol(setup, tmp_path,
                                                       monkeypatch):
    """The eval-interval evaluators must run the configured inner-loop
    protocol (replacement, lr scheduler, augmentation engine selection),
    not EvalConfig defaults — their IoUs drive best-seen checkpointing
    (reference train.py:108-109 threads replacement into evaluate; the
    scheduler lives on the shared Gecko instance)."""
    import mliis_tpu.meta.train as train_mod
    captured = []
    real = train_mod.GeckoEvaluator

    class Capture(real):
        def __init__(self, model, loss_cfg, opt_cfg, eval_cfg, store,
                     **kw):
            captured.append(eval_cfg)
            super().__init__(model, loss_cfg, opt_cfg, eval_cfg, store,
                             **kw)

    monkeypatch.setattr(train_mod, "GeckoEvaluator", Capture)
    train, test, model, loss_cfg, opt_cfg, state = setup
    meta_cfg = MetaTrainConfig(num_shots=6, inner_batch_size=3,
                               inner_iters=2, meta_batch_size=2, foml=False,
                               augment=False, replacement=True,
                               lr_scheduler="step_decay", lr_decay_rate=0.25,
                               lr_decay_after_n_steps=1,
                               pallas_augment=False)
    loop_cfg = TrainLoopConfig(meta_iters=1, meta_step_size=0.3,
                               meta_step_size_final=0.1, eval_interval=5,
                               eval_inner_batch_size=3, eval_inner_iters=2,
                               num_eval_shots=5, num_tasks_to_eval=1,
                               save_checkpoint_every_n_meta_iters=5, lr=0.01)
    train_gecko(model, _fresh(state), train, test,
                os.path.join(str(tmp_path), "inherit"), loss_cfg, opt_cfg,
                meta_cfg, loop_cfg, jax.random.PRNGKey(7),
                log_fn=lambda *a: None, eval_task_chunk_size=1)
    assert len(captured) == 2
    for cfg in captured:
        assert cfg.replacement is True
        assert cfg.lr_scheduler == "step_decay"
        assert cfg.lr_decay_rate == 0.25
        assert cfg.lr_decay_after_n_steps == 1
        assert cfg.pallas_augment is False
