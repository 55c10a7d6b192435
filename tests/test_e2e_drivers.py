"""End-to-end CLI driver smokes: the full call stacks of SURVEY.md section 3
(run_metasegnet.py:28-210, joint_train.py:295-344) executed in-suite on
synthetic tasks — train -> eval -> canonical grep line ->
meta-test_results.json, the UHO path, and the joint trainer."""
import json
import os

import numpy as np

import pytest

from mliis_tpu.cli import joint_train as joint_cli
from mliis_tpu.cli import run_metasegnet


def _meta_args(tmp_path, extra=()):
    ckpt = os.path.join(str(tmp_path), "ckpt")
    return [
        "--synthetic", "--synthetic_tasks", "6", "--image_size", "32",
        "--rsd", "2", "--sgd", "--loss_name", "bce_dice",
        "--inner-batch", "4", "--train-shots", "6", "--inner-iters", "2",
        "--learning-rate", "0.005", "--meta-iters", "2", "--meta-batch", "2",
        "--eval-interval", "2", "--eval-samples", "1", "--shots", "5",
        "--eval-batch", "4", "--eval-iters", "2", "--transductive",
        "--serially_eval_all_test_tasks", "--meta-step", "0.1",
        "--task_chunk_size", "2", "--checkpoint", ckpt,
    ] + list(extra), ckpt


def test_run_metasegnet_synthetic_end_to_end(tmp_path, capsys):
    """Meta-train -> train/test eval -> grep line -> results JSON
    (run_metasegnet.py:28-210 call stack)."""
    argv, ckpt = _meta_args(tmp_path)
    run_metasegnet.main(argv)
    out = capsys.readouterr().out
    assert "Mean IoU over all meta-test tasks:" in out
    assert "Meta-training..." in out
    results = os.path.join(ckpt, "meta-test_results.json")
    assert os.path.exists(results)
    with open(results) as f:
        task_map = json.load(f)
    assert task_map and all(isinstance(v, list) for v in task_map.values())
    # Periodic checkpoints were written during training.
    assert any("ckpt" in n or "checkpoint" in n.lower()
               for n in os.listdir(ckpt))


def test_run_metasegnet_uho_path(tmp_path, capsys):
    """The section 3.3 stack: UHO on the val set -> estimated lr/steps ->
    final eval with them; asserts the search CSV artifact."""
    argv, ckpt = _meta_args(tmp_path, extra=[
        "--optimize_update_hyperparms_on_val_set", "--num_val_tasks", "2",
        "--num_configs_to_sample", "2", "--min_steps", "1",
        "--max_steps", "3", "--fss_1000",  # 1 split per config, not 4
    ])
    run_metasegnet.main(argv)
    out = capsys.readouterr().out
    assert "UHO estimated lr=" in out
    assert "Mean IoU over all meta-test tasks:" in out
    # uho_eval inserts "_{shots}-shot" before the extension (parity with the
    # reference's save_results naming).
    csvs = [n for n in os.listdir(ckpt) if n.endswith(".csv")
            and "hyper_param_search" in n]
    assert csvs, os.listdir(ckpt)
    with open(os.path.join(ckpt, csvs[0])) as f:
        assert len(f.readlines()) >= 3  # header + 2 sampled configs


def test_run_metasegnet_pretrained_eval_only(tmp_path, capsys):
    """--pretrained restore -> eval-only path (the run.sh SOTA-eval stack,
    section 3.2): restores the checkpoint written by a 1-iter train run."""
    argv, ckpt = _meta_args(tmp_path)
    run_metasegnet.main(argv)
    capsys.readouterr()
    argv2, _ = _meta_args(tmp_path, extra=["--pretrained"])
    run_metasegnet.main(argv2)
    out = capsys.readouterr().out
    assert "Restoring from checkpoint" in out
    assert "Mean IoU over all meta-test tasks:" in out


def test_joint_train_synthetic_end_to_end(tmp_path, capsys):
    """joint_train.py:295-344 stack on synthetic shards."""
    ckpt = os.path.join(str(tmp_path), "joint_ckpt")
    joint_cli.main([
        "--synthetic", "--synthetic_tasks", "4", "--image_size", "32",
        "--rsd", "2", "--sgd", "--batch_size", "4", "--epochs", "2",
        "--steps_per_epoch", "2", "--learning_rate", "0.005",
        "--val_batches", "1", "--eval_interval", "1",
        "--checkpoint", ckpt, "--seed", "0",
    ])
    out = capsys.readouterr().out
    assert "Finished training" in out
    assert os.path.exists(ckpt)


def test_run_metasegnet_k_shot_experiment(tmp_path, capsys):
    """Section 3.5 stack: --run_k_shot_learning_curves_experiment through
    main() -> k-shot-results.csv rows."""
    import os as _os
    cwd = _os.getcwd()
    _os.chdir(str(tmp_path))  # the experiment writes k-shot-results.csv here
    try:
        argv, ckpt = _meta_args(tmp_path, extra=[
            "--run_k_shot_learning_curves_experiment",
            "--k_shot_k_range", "2", "4",
            "--k_shot_iter_range", "1", "2",
        ])
        run_metasegnet.main(argv)
    finally:
        _os.chdir(cwd)
    out = capsys.readouterr().out
    assert "-shot mIoU" in out
    csv_path = os.path.join(str(tmp_path), "k-shot-results.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = f.readlines()
    assert rows[0].strip() == "k,mIoU" and len(rows) > 1


def test_joint_train_from_shards_end_to_end(tmp_path, capsys, rng):
    """The reference's shard-consuming joint workflow
    (joint_train/data/input_fn.py:23-133): class image dirs ->
    convert_fss_1000_joint -> --joint_shard_dir CLI run."""
    from PIL import Image
    from mliis_tpu.data import manifests
    from mliis_tpu.data.convert import convert_fss_1000_joint

    size = 32
    names = sorted(manifests.TRAIN_TASK_IDS)[:3] \
        + sorted(manifests.TEST_TASK_IDS)[:1]
    root = os.path.join(str(tmp_path), "fss")
    for cls in names:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(1, 5):
            img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
            msk = (rng.random((size, size)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(img).save(os.path.join(d, "{}.jpg".format(i)))
            Image.fromarray(msk).save(os.path.join(d, "{}.png".format(i)))
    shards = os.path.join(str(tmp_path), "shards")
    convert_fss_1000_joint(root, shards, num_val_tasks=0,
                           examples_per_shard=4, image_dims=size,
                           num_workers=1)

    ckpt = os.path.join(str(tmp_path), "joint_ckpt")
    joint_cli.main([
        "--joint_shard_dir", shards, "--image_size", str(size),
        "--rsd", "2", "--sgd", "--batch_size", "4", "--epochs", "1",
        "--steps_per_epoch", "2", "--learning_rate", "0.005",
        "--val_batches", "1", "--eval_interval", "1",
        "--checkpoint", ckpt, "--seed", "0",
    ])
    out = capsys.readouterr().out
    assert "building dataset with labels with 5 mask channels" in out
    assert "Finished training" in out
    assert os.path.exists(ckpt)
