"""CLI parity tests: the reference run.sh flag set must parse and map into
the engine configs with the documented values."""
import shlex

import pytest

from mliis_tpu.cli import args as args_lib

RUN_SH_FLAGS = (
    "--fss_1000 --image_size 224 --pretrained --rsd 2 4 --l2 "
    "--foml --foml-tail 5 --final_layer_dropout_rate 0.5 --augment "
    "--aug_rate 0.5 --sgd --loss_name bce_dice --inner-batch 8 "
    "--learning-rate 0.0005 --train-shots 10 --inner-iters 59 "
    "--learning_rate_scheduler fixed --meta-iters 50000 --meta-batch 5 "
    "--eval-interval 500 --serially_eval_all_test_tasks --eval-samples 2 "
    "--shots 5 --eval-batch 8 --eval-iters 59 --transductive "
    "--model_name efficientlab --sgd --meta-step 0.1 "
    "--meta-step-final 0.00001 --checkpoint ckpt --data-dir shards")


@pytest.fixture
def run_sh_args():
    return args_lib.argument_parser().parse_args(shlex.split(RUN_SH_FLAGS))


def test_run_sh_flags_parse(run_sh_args):
    a = run_sh_args
    assert a.fss_1000 and a.pretrained and a.foml and a.sgd and a.transductive
    assert a.rsd == [2, 4]
    assert a.foml_tail == 5
    assert a.inner_iters == 59 and a.inner_batch == 8
    assert a.learning_rate == 0.0005
    assert a.meta_step == 0.1 and a.meta_step_final == 1e-5
    assert a.eval_samples == 2 and a.serially_eval_all_test_tasks


def test_model_kwargs_from_run_sh(run_sh_args):
    kw = args_lib.model_kwargs(run_sh_args)
    assert kw["rsd"] == (2, 4)
    assert kw["final_layer_dropout_rate"] == 0.5
    assert kw["feature_extractor_name"] == "efficientnet-b0"


def test_loss_and_opt_config_from_run_sh(run_sh_args):
    loss = args_lib.loss_config(run_sh_args)
    assert loss.dice and loss.l2 and not loss.l1
    opt = args_lib.opt_config(run_sh_args)
    assert opt.name == "sgd"


def test_meta_train_config_from_run_sh(run_sh_args):
    cfg = args_lib.meta_train_config(run_sh_args)
    assert cfg.foml and cfg.tail_shots == 5
    assert cfg.num_shots == 10  # train_shots
    assert cfg.inner_iters == 59 and cfg.inner_batch_size == 8
    assert cfg.meta_batch_size == 5
    assert cfg.aug_rate == 0.5


def test_eval_config_from_run_sh(run_sh_args):
    cfg = args_lib.eval_config(run_sh_args, inner_iters=59)
    assert cfg.num_shots == 5 and cfg.inner_iters == 59
    assert cfg.transductive and cfg.augment
    assert cfg.inner_batch_size == 8


def test_adam_default_when_no_sgd():
    a = args_lib.argument_parser().parse_args([])
    assert args_lib.opt_config(a).name == "adam"


def test_defaults_match_reference():
    a = args_lib.argument_parser().parse_args([])
    assert a.shots == 5 and a.train_shots == 5
    assert a.inner_batch == 8 and a.inner_iters == 8
    assert a.learning_rate == 1e-3
    assert a.meta_step == 0.1 and a.meta_iters == 400000
    assert a.eval_samples == 200 and a.eval_interval == 10
    assert a.weight_decay == 1
    assert a.image_size == 320
    assert a.aug_rate == 0.5
    assert a.max_steps == 80 and a.min_steps == 0
    assert a.lr_search_range_low == 0.0005
    assert a.uho_results_csv_name == \
        "val-set_hyper_param_search_results.csv"


def test_vestigial_unet_flags_accepted():
    """A reference user's saved command line containing the vestigial U-Net
    flags (reference args.py:51-53,62) must parse; they have no effect."""
    a = args_lib.argument_parser().parse_args(shlex.split(
        RUN_SH_FLAGS + " --n_unet_encoding_stacks 4 "
                       "--start_num_feature_maps_power 5"))
    assert a.n_unet_encoding_stacks == 4
    assert a.start_num_feature_maps_power == 5
    kw = args_lib.model_kwargs(a)
    assert "n_unet_encoding_stacks" not in kw  # not threaded into the model


def test_joint_train_args_parse():
    from mliis_tpu.cli.joint_train import parse_args
    a = parse_args(shlex.split(
        "--synthetic --sgd --l2 --augment --final_layer_dropout_rate 0.2 "
        "--rsd 2 --batch_size 3 --epochs 10 --steps_per_epoch 2 "
        "--val_batches 2"))
    assert a.sgd and a.l2 and a.augment
    assert a.rsd == [2] and a.batch_size == 3


def test_use_batch_stats_at_predict_flag():
    a = args_lib.argument_parser().parse_args(["--use_batch_stats_at_predict",
                                               "--transductive"])
    cfg = args_lib.eval_config(a)
    assert cfg.use_batch_stats_at_predict and cfg.transductive
    default = args_lib.eval_config(args_lib.argument_parser().parse_args([]))
    assert not default.use_batch_stats_at_predict


def test_mesh_tasks_flag_reaches_train_loop_config():
    a = args_lib.argument_parser().parse_args(["--mesh_tasks", "8"])
    assert args_lib.train_loop_config(a).mesh_tasks == 8


def test_pallas_augment_mode_flag():
    on = args_lib.argument_parser().parse_args(["--pallas_augment", "on"])
    assert args_lib.meta_train_config(on).pallas_augment is True
    assert args_lib.eval_config(on).pallas_augment is True
    off = args_lib.argument_parser().parse_args(["--pallas_augment", "off"])
    assert args_lib.meta_train_config(off).pallas_augment is False
    auto = args_lib.argument_parser().parse_args([])
    assert args_lib.meta_train_config(auto).pallas_augment is None


def test_rng_impl_flag_parses():
    a = args_lib.argument_parser().parse_args(["--rng_impl", "rbg"])
    assert a.rng_impl == "rbg"
    assert args_lib.argument_parser().parse_args([]).rng_impl == "threefry"


def test_chain_flags_reach_configs():
    a = args_lib.argument_parser().parse_args(["--chain_tasks",
                                               "--chain_eval_chunk"])
    assert args_lib.train_loop_config(a).chain_tasks
    assert args_lib.train_loop_config(a).chain_eval_chunk
    assert args_lib.eval_config(a).chain_chunk
    default = args_lib.argument_parser().parse_args([])
    assert not args_lib.train_loop_config(default).chain_tasks
    assert not args_lib.eval_config(default).chain_chunk


def test_precompute_augment_flag_reaches_both_configs():
    a = args_lib.argument_parser().parse_args(["--precompute_augment"])
    assert args_lib.meta_train_config(a).precompute_augment
    assert args_lib.eval_config(a).precompute_augment
    default = args_lib.argument_parser().parse_args([])
    assert not args_lib.meta_train_config(default).precompute_augment
    assert not args_lib.eval_config(default).precompute_augment
