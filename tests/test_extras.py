"""Tests for TF1-name import mapping, native loader, viz export, profiling,
LR-scheduled eval, and prediction/fine-tune artifact export."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       init_model_state, make_lr_array)
from mliis_tpu.models import tf1_import
from tests.tiny_model import TinySeg

IMG = 16


# ---------------- TF1 name mapping ----------------

def test_map_backbone_names():
    f = tf1_import.map_tf1_name
    assert f("efficientnet-b0/stem/conv2d/kernel") == \
        "params/efficientnet_b0/stem_conv/kernel"
    assert f("efficientnet-b0/stem/tpu_batch_normalization/gamma") == \
        "params/efficientnet_b0/stem_batch_normalization/scale"
    assert f("efficientnet-b0/stem/tpu_batch_normalization/moving_mean") == \
        "batch_stats/efficientnet_b0/stem_batch_normalization/mean"
    assert f("efficientnet-b0/blocks_3/conv2d/kernel") == \
        "params/efficientnet_b0/blocks_3/expand_conv/kernel"
    assert f("efficientnet-b0/blocks_3/conv2d_1/kernel") == \
        "params/efficientnet_b0/blocks_3/project_conv/kernel"
    assert f("efficientnet-b0/blocks_3/depthwise_conv2d/depthwise_kernel") \
        == "params/efficientnet_b0/blocks_3/depthwise_conv/kernel"
    assert f("efficientnet-b0/blocks_3/se/conv2d/bias") == \
        "params/efficientnet_b0/blocks_3/se_reduce/bias"
    assert f("efficientnet-b0/blocks_3/se/conv2d_1/kernel") == \
        "params/efficientnet_b0/blocks_3/se_expand/kernel"
    assert f("efficientnet-b0/blocks_3/tpu_batch_normalization_2/"
             "moving_variance") == \
        "batch_stats/efficientnet_b0/blocks_3/batch_normalization_2/var"


def test_map_decoder_names():
    f = tf1_import.map_tf1_name
    assert f("decode/decode_skip_connections_1/conv2d/kernel") == \
        "params/decode_skip_connections_1/branch_0/conv/kernel"
    assert f("decode/decode_skip_connections_1/conv2d_2/bias") == \
        "params/decode_skip_connections_1/fuse/conv/bias"
    assert f("decode/final_layer_weights/kernel") == \
        "params/final_layer_weights/kernel"
    assert f("global_step") is None


def test_convert_tf1_vars_depthwise_and_noexpand():
    tf_vars = {
        # depthwise kernel [kh,kw,C,1] -> [kh,kw,1,C]
        "efficientnet-b0/blocks_0/depthwise_conv2d/depthwise_kernel":
            np.zeros((3, 3, 32, 1), np.float32),
        # no-expand block: plain conv2d with 1x1 kernel that narrows
        # channels is the project conv
        "efficientnet-b0/blocks_0/conv2d/kernel":
            np.zeros((1, 1, 32, 16), np.float32),
    }
    out = tf1_import.convert_tf1_vars(tf_vars)
    assert out["params/efficientnet_b0/blocks_0/depthwise_conv/kernel"
               ].shape == (3, 3, 1, 32)
    assert "params/efficientnet_b0/blocks_0/project_conv/kernel" in out


def test_convert_rsd_upsample_proj_shift():
    tf_vars = {
        "decode/decode_skip_connections_1/conv2d/kernel":
            np.zeros((1, 1, 224, 112), np.float32),
        "decode/decode_skip_connections_1/conv2d_1/kernel":
            np.zeros((1, 1, 136, 112), np.float32),
    }
    out = tf1_import.convert_tf1_vars(
        tf_vars, rsd_has_upsample_proj={1: True})
    assert "params/decode_skip_connections_1/upsample_proj/conv/kernel" in out
    assert "params/decode_skip_connections_1/branch_0/conv/kernel" in out


# ---------------- lr schedules in engine ----------------

def test_make_lr_array_variants():
    fixed = np.asarray(make_lr_array(0.1, 4, "fixed"))
    np.testing.assert_allclose(fixed, 0.1)
    step = np.asarray(make_lr_array(0.1, 10, "step_decay", 0.5, 5))
    np.testing.assert_allclose(step[:5], 0.1, rtol=1e-6)
    np.testing.assert_allclose(step[5:], 0.05, rtol=1e-6)
    cos = np.asarray(make_lr_array(jnp.float32(0.1), 8, "cosine_anneal"))
    assert cos[0] == pytest.approx(0.1, rel=1e-5)


def test_eval_with_scheduler_runs():
    store = make_synthetic_store(num_tasks=2, examples_per_task=10,
                                 image_size=IMG)
    model = TinySeg()
    opt_cfg = OptimizerConfig("sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=4, lr_scheduler="cosine_anneal",
                     task_chunk_size=2, augment=False)
    ev = GeckoEvaluator(model, LossConfig(l2=False), opt_cfg, cfg, store)
    miou, _ = ev.evaluate(state, jax.random.PRNGKey(1), lr=0.02,
                          eval_all_tasks=True)
    assert 0.0 <= miou <= 1.0


# ---------------- artifact export ----------------

def test_fine_tuned_checkpoint_and_predictions_export(tmp_path, monkeypatch):
    store = make_synthetic_store(num_tasks=2, examples_per_task=10,
                                 image_size=IMG)
    model = TinySeg()
    opt_cfg = OptimizerConfig("sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), IMG, opt_cfg)
    cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                     inner_iters=2, task_chunk_size=2, augment=False)
    ev = GeckoEvaluator(model, LossConfig(l2=False), opt_cfg, cfg, store)
    monkeypatch.setenv("SAVE_PREDICTIONS", "1")
    monkeypatch.chdir(tmp_path)
    ft_dir = str(tmp_path / "ft")
    ev.evaluate(state, jax.random.PRNGKey(1), lr=0.02, eval_all_tasks=True,
                save_fine_tuned_checkpoints=True,
                save_fine_tuned_checkpoints_dir=ft_dir, eval_sample_num=0)
    # fine-tuned checkpoints per task
    for name in store.names:
        assert os.path.isdir(os.path.join(ft_dir, name, "0"))
    # prediction overlays
    preds = os.listdir(str(tmp_path / "predictions"))
    assert len(preds) == 2 * 5  # 2 tasks x 5 query images


def test_predictions_dir_override(tmp_path, monkeypatch):
    from mliis_tpu.utils import viz
    # Parity default: the reference hardcodes "predictions/" (reptile.py:512)
    monkeypatch.delenv("PREDICTIONS_DIR", raising=False)
    assert viz.predictions_dir() == "predictions"
    out = str(tmp_path / "elsewhere")
    monkeypatch.setenv("PREDICTIONS_DIR", out)
    img = np.random.rand(8, 8, 3).astype(np.float32)
    pred = np.zeros((8, 8), bool)
    viz.save_query_predictions([img], [pred], task_name="t")
    assert os.path.isfile(os.path.join(out, "prediction_t_0.jpeg"))


# ---------------- profiling ----------------

def test_phase_timer(tmp_path):
    from mliis_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    out = str(tmp_path / "phases.jsonl")
    t.dump(out, log_fn=lambda *a: None)
    assert os.path.exists(out)


# ---------------- profiling ----------------

def test_trace_and_phase_timer(tmp_path):
    from mliis_tpu.utils.profiling import PhaseTimer, trace
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        x = jnp.ones((32, 32))
        jax.block_until_ready(x @ x)
    # jax profiler writes plugin event files under the dir
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "profiler trace wrote no files"

    timer = PhaseTimer()
    with timer.phase("work"):
        pass
    summary = timer.summary()
    assert summary["work"]["count"] == 1
    out = str(tmp_path / "timings.jsonl")
    timer.dump(out, log_fn=lambda *a: None)
    assert os.path.exists(out)
