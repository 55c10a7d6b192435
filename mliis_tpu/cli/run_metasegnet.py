"""Meta-trains and evaluates image segmentation models.

The run_metasegnet.py-equivalent driver (reference run_metasegnet.py:28-210),
flag-for-flag: model build -> dataset selection (FSS-1000 / FP-k holdout /
k-shot experiment / synthetic) -> restore or meta-train -> optional UHO on
the val set (+ optional meta-fine-tune on train+val) -> k-shot experiment or
train/test evaluation -> the canonical grep line and meta-test_results.json.
"""
import datetime
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.cli import args as args_lib
from mliis_tpu.data import manifests
from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.data.task_store import (assert_train_test_split,
                                       load_task_store, split_fss_1000,
                                       union_tasks_by_synonyms,
                                       validate_datasets)
from mliis_tpu.meta.evaluate import GeckoEvaluator, evaluate_gecko
from mliis_tpu.meta.inner_loop import init_model_state
from mliis_tpu.meta.kshot import run_k_shot_learning_curves_experiment
from mliis_tpu.meta.train import train_gecko
from mliis_tpu.meta.uho_eval import (EarlyStoppingEvaluator,
                                     optimize_update_hyperparams)
from mliis_tpu.models.efficientlab import EfficientLab
from mliis_tpu.ops.meta_math import tree_count_params
from mliis_tpu.utils import checkpoint as ckpt_lib


def load_datasets(args):
    """Returns (train_store, val_store, test_store)."""
    if args.synthetic:
        store = make_synthetic_store(num_tasks=args.synthetic_tasks,
                                     examples_per_task=10,
                                     image_size=args.image_size,
                                     seed=args.seed)
        n_test = max(args.synthetic_tasks // 4, 1)
        test = store.subset(range(n_test))
        rest = store.subset(range(n_test, store.num_tasks))
        val = None
        if args.num_val_tasks:
            val = rest.subset(range(args.num_val_tasks))
            rest = rest.subset(range(args.num_val_tasks, rest.num_tasks))
        return rest, val, test

    store = load_task_store(args.data_dir, image_size=args.image_size)
    if args.run_k_shot_learning_curves_experiment:
        test = union_tasks_by_synonyms(store)
        return None, None, test
    test_ids = manifests.FP_K_TEST_TASK_IDS if args.fp_k_test_set else None
    return split_fss_1000(store, num_val_tasks=args.num_val_tasks,
                          test_task_ids=test_ids)


def main(argv=None):
    start_time = datetime.datetime.now()
    print("Experiment started at: {}".format(start_time))
    args = args_lib.argument_parser().parse_args(argv)
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    if args.rng_impl != "threefry":
        import jax
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    if args.profile_dir:
        from mliis_tpu.utils.profiling import trace
        with trace(args.profile_dir):
            return _main_impl(args, start_time)
    return _main_impl(args, start_time)


def _main_impl(args, start_time):

    if args.optimize_update_hyperparms_on_val_set:
        assert args.num_val_tasks > 0, \
            "Must specify num_val_tasks > 0 to optimize update hyperparams."

    random.seed(args.seed)
    key = jax.random.PRNGKey(args.seed)

    print("Defining model architecture:")
    loss_cfg = args_lib.loss_config(args)
    opt_cfg = args_lib.opt_config(args)
    model = EfficientLab(**args_lib.model_kwargs(args))
    key, init_key = jax.random.split(key)
    # jit_init: one persistent-CPU-cached init program instead of ~405
    # eager op compiles (~35 s) per session (docs/PERF_NOTES.md).
    state = init_model_state(model, init_key, args.image_size, opt_cfg,
                             jit_init=True)
    print("Model contains {} trainable parameters.".format(
        tree_count_params(state.params)))
    print("Meta-learning with algorithm:")
    print("FOMAML" if args.foml else "Reptile")

    print("Setting up meta-learning dataset")
    train_store, val_store, test_store = load_datasets(args)
    print("Found {} testing tasks.".format(test_store.num_tasks))
    if train_store is not None:
        print("Found {} training tasks.".format(train_store.num_tasks))
    validate_datasets(train_store, val_store, test_store,
                      pretrained=args.pretrained,
                      run_k_shot_experiment=(
                          args.run_k_shot_learning_curves_experiment),
                      eval_val_tasks=args.eval_val_tasks)
    if not args.run_k_shot_learning_curves_experiment:
        assert_train_test_split(
            train_store, test_store,
            check_image_hashes=args.test_train_test_split)
        if val_store is not None:
            assert_train_test_split(
                val_store, test_store,
                check_image_hashes=args.test_train_test_split)

    if args.restore_efficient_net_weights_from and not args.pretrained:
        print("Restoring backbone from {}".format(
            args.restore_efficient_net_weights_from))
        state, _ = ckpt_lib.restore_checkpoint(
            args.restore_efficient_net_weights_from, state,
            filter_to_scopes=[args.feature_extractor_name.replace("-", "_")])

    if not args.pretrained:
        print("Meta-training...")
        if args.continue_training_from_checkpoint:
            state, _ = ckpt_lib.restore_checkpoint(
                args.continue_training_from_checkpoint, state)
            print("Continuing meta-training from checkpoint.")
        key, train_key = jax.random.split(key)
        state = train_gecko(
            model, state, train_store, val_store or test_store,
            args.checkpoint, loss_cfg, opt_cfg,
            args_lib.meta_train_config(args), args_lib.train_loop_config(args),
            train_key, eval_task_chunk_size=args.task_chunk_size)
    else:
        if args.do_not_restore_final_layer_weights:
            print("Restoring from checkpoint (without final layer): {}"
                  .format(args.checkpoint))
            state, _ = ckpt_lib.restore_checkpoint(
                args.checkpoint, state,
                filter_out_scope="final_layer_weights")
        else:
            print("Restoring from checkpoint: {}".format(args.checkpoint))
            state, _ = ckpt_lib.restore_checkpoint(args.checkpoint, state)

    eval_lr = None  # None -> model default LR (placeholder-default parity)
    eval_inner_iters = args.eval_iters

    mesh = None
    if args.mesh_data > 1 and not args.mesh_tasks:
        raise SystemExit("--mesh_data requires --mesh_tasks (use "
                         "--mesh_tasks 1 for pure data parallelism)")
    if args.mesh_tasks:
        from mliis_tpu.parallel.mesh import make_task_mesh
        # Eval/UHO shard tasks over ALL devices: with --mesh_data the 2D
        # (task, data) layout is a training-step concern (meta/train.py);
        # evaluation treats the same devices as one task axis.
        mesh = make_task_mesh(args.mesh_tasks * max(1, args.mesh_data))

    if args.optimize_update_hyperparms_on_val_set:
        print("Optimizing the update routine hyperparams on the val set")
        assert val_store is not None and val_store.num_tasks > 0
        es_eval = EarlyStoppingEvaluator(
            model, loss_cfg, opt_cfg, val_store, num_shots=args.shots,
            replacement=args.replacement, augment=args.augment,
            weight_decay_rate=args.weight_decay,
            task_chunk_size=args.task_chunk_size, mesh=mesh,
            pallas_augment=args_lib.pallas_augment_mode(args),
            chain_chunk=args.chain_eval_chunk)
        key, uho_key = jax.random.split(key)
        estimated_lr, estimated_steps = optimize_update_hyperparams(
            es_eval, state, uho_key, min_steps=args.min_steps,
            max_steps=args.max_steps,
            num_train_val_data_splits_to_sample_per_config=(
                1 if args.fss_1000 else 4),
            num_configs_to_sample=args.num_configs_to_sample,
            lr_search_range_low=args.lr_search_range_low,
            lr_search_range_high=args.lr_search_range_high,
            drop_rate_search_range_low=args.drop_rate_search_range_low,
            drop_rate_search_range_high=args.drop_rate_search_range_high,
            aug_rate_search_range_low=args.aug_rate_search_range_low,
            aug_rate_search_range_high=args.aug_rate_search_range_high,
            batch_size_search_range_low=args.batch_size_search_range_low,
            batch_size_search_range_high=args.batch_size_search_range_high,
            serially_eval_all_tasks=args.serially_eval_all_test_tasks,
            eval_tasks_with_median_early_stopping_iterations=(
                args.eval_tasks_with_median_early_stopping_iterations),
            save_dir=args.checkpoint,
            results_csv_name=args.uho_results_csv_name,
            num_shots=args.shots, estimator=args.uho_estimator)
        eval_lr, eval_inner_iters = estimated_lr, estimated_steps
        print("UHO estimated lr={} steps={}".format(eval_lr, eval_inner_iters))

        if args.meta_fine_tune_steps_on_train_val > 0:
            print("Meta-fine-tuning for {} steps with optimized "
                  "hyperparameters.".format(
                      args.meta_fine_tune_steps_on_train_val))
            from mliis_tpu.data.task_store import TaskStore
            merged = TaskStore(
                np.concatenate([train_store.images, val_store.images]),
                np.concatenate([train_store.masks, val_store.masks]),
                np.concatenate([train_store.counts, val_store.counts]),
                train_store.names + val_store.names)
            import dataclasses as _dc
            ft_loop = _dc.replace(
                args_lib.train_loop_config(args),
                meta_iters=args.meta_fine_tune_steps_on_train_val,
                meta_step_size=args.meta_step_final,
                lr=estimated_lr)
            ft_meta = _dc.replace(args_lib.meta_train_config(args),
                                  inner_iters=estimated_steps)
            key, ft_key = jax.random.split(key)
            state = train_gecko(
                model, state, merged, test_store,
                os.path.join(args.checkpoint,
                             "fine-tuned_on_train_val_with_optimized_"
                             "update_hyperparams"),
                loss_cfg, opt_cfg, ft_meta, ft_loop, ft_key,
                eval_task_chunk_size=args.task_chunk_size)

    if args.run_k_shot_learning_curves_experiment:
        key, k_key = jax.random.split(key)
        kshot_kwargs = {}
        if args.k_shot_k_range:
            kshot_kwargs["k_range"] = args.k_shot_k_range
        run_k_shot_learning_curves_experiment(
            model, loss_cfg, opt_cfg, state, test_store, k_key,
            num_samples=args.eval_samples,
            iter_range=args.k_shot_iter_range,
            eval_inner_batch_size=args.eval_batch,
            eval_inner_iters=eval_inner_iters,
            lr=eval_lr if eval_lr is not None else args.learning_rate,
            aug_rate=args.aug_rate,
            pallas_augment=args_lib.pallas_augment_mode(args),
            **kshot_kwargs)
        return

    # lr None means "model default" in the reference; our engine takes the
    # explicit value.
    lr = eval_lr if eval_lr is not None else args.learning_rate
    eval_cfg = args_lib.eval_config(args, inner_iters=eval_inner_iters)

    print('Evaluating {}-shot learning on training tasks.'.format(args.shots))
    mean_train_iou = float("nan")
    if train_store is not None:
        train_evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg,
                                         train_store, mesh=mesh)
        key, tr_key = jax.random.split(key)
        mean_train_iou, _ = evaluate_gecko(
            train_evaluator, state, tr_key, lr=lr,
            num_samples=args.eval_samples, serially_eval_all_tasks=False,
            num_tasks_to_sample=1, aug_rate=args.aug_rate,
            save_fine_tuned_checkpoints=args.save_fine_tuned_checkpoints_train,
            save_fine_tuned_checkpoints_dir=(
                args.save_fine_tuned_checkpoints_dir))

    if args.eval_val_tasks:
        target_store, test_set_string = val_store, "val"
    else:
        target_store, test_set_string = test_store, "test"
    print('Evaluating {}-shot learning on meta-{} tasks.'.format(
        args.shots, test_set_string))
    evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg,
                               target_store, mesh=mesh)
    key, te_key = jax.random.split(key)
    mean_test_iou, task_name_iou_map = evaluate_gecko(
        evaluator, state, te_key, lr=lr, num_samples=args.eval_samples,
        serially_eval_all_tasks=args.serially_eval_all_test_tasks,
        num_tasks_to_sample=1, aug_rate=args.aug_rate,
        save_fine_tuned_checkpoints=args.save_fine_tuned_checkpoints,
        save_fine_tuned_checkpoints_dir=args.save_fine_tuned_checkpoints_dir)

    print("Evaluated meta-{} tasks:".format(test_set_string))
    print(task_name_iou_map)
    if train_store is not None:
        print("Mean meta-train IoU: {}".format(mean_train_iou))
    # Do NOT change this print (it's used to grep logs):
    print("Mean IoU over all meta-test tasks: {}".format(mean_test_iou))

    os.makedirs(args.checkpoint, exist_ok=True)
    results_path = os.path.join(args.checkpoint, "meta-test_results.json")
    with open(results_path, "w") as f:
        json.dump(task_name_iou_map, f)
    print("Wrote results to {}".format(results_path))

    if args.export_serving_artifact:
        from mliis_tpu.utils.export import save_serving_artifact
        save_serving_artifact(args.export_serving_artifact, model, state,
                              args.image_size)
        print("Exported serving artifact to {}".format(
            args.export_serving_artifact))

    end_time = datetime.datetime.now()
    print("Experiment finished at: {}, taking {}".format(
        end_time, end_time - start_time))


if __name__ == "__main__":
    main()
