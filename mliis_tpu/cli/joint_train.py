"""Joint (non-meta) segmentation training driver — joint_train.py parity.

Trains EfficientLab on all training classes at once (1000-way + background)
with SGD and a linear LR anneal, evaluating IoU on held-out batches
(reference joint_train.py:295-344).
"""
import argparse
import time

import jax

from mliis_tpu.cli import args as args_lib
from mliis_tpu.data import manifests
from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.data.task_store import load_task_store
from mliis_tpu.joint.trainer import (JointTrainConfig, JointTrainer,
                                     joint_dataset_from_task_store)
from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
from mliis_tpu.models.efficientlab import EfficientLab
from mliis_tpu.utils import checkpoint as ckpt_lib


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train segmentation model via SGD.")
    add = parser.add_argument
    add('--data_dir', type=str, default=None)
    add('--joint_shard_dir', type=str, default=None,
        help='Directory of train_*/val_*/test_* joint shards written by '
             'convert_fss_1000_joint: builds the datasets via '
             'data.convert.load_joint_shards (the reference shard-consuming '
             'workflow, joint_train/data/input_fn.py:23-133) instead of '
             'flattening a per-task store.')
    add('--model_name', default='efficientlab')
    add('--feature_extractor_name', default='efficientnet-b0')
    add('--rsd', type=int, nargs='+', default=[2])
    add('--loss_name', default='cross_entropy')
    add('--sgd', action='store_true')
    add('--l2', action='store_true')
    add('--augment', action='store_true')
    add('--final_layer_dropout_rate', type=float, default=0.0)
    add('--image_size', type=int, default=224)
    # Accepted for CLI compatibility (reference joint_train.py:50); the
    # rebuild always trains the separate-background-channel variant — the
    # published configuration (README commands all pass this flag). The
    # non-mutually-exclusive-mask variant is not rebuilt.
    add('--seperate_background_channel', action='store_true')
    add('--fp_k_test_set', action='store_true')
    add('--test_on_val_set', action='store_true',
        help='Train on train-minus-val classes and monitor on the val '
             'split (reference joint_train.py:120-135 trains on shards '
             'without the val tag and tests on val shards). The val split '
             'is --num_val_tasks classes popped deterministically off the '
             'sorted train class list.')
    add('--num_val_tasks', type=int, default=50,
        help='Val-split size for --test_on_val_set (the reference encodes '
             'the split in shard filename tags; here it is derived '
             'reproducibly from the class list).')
    add('--restore_efficient_net_weights_from', type=str, default=None)
    add('--batch_size', default=64, type=int)
    add('--epochs', default=200, type=int)
    add('--steps_per_epoch', type=int, default=None)
    add('--learning_rate', default=0.005, type=float)
    add('--final_learning_rate', default=5e-7, type=float)
    add('--label_smoothing', default=0.0, type=float)
    add('--val_batches', default=20, type=int)
    add('--pretrained', action='store_true', default=False)
    add('--eval_interval', default=2, type=int)
    add('--seed', default=0, type=int)
    add('--checkpoint', default='/tmp/model_checkpoint', type=str)
    add('--synthetic', action='store_true')
    add('--synthetic_tasks', type=int, default=8)
    add('--pallas_augment', choices=['auto', 'on', 'off'], default='auto',
        help='Fused Pallas augmentation kernel (auto = on for TPU backends).')
    add('--mesh_data', type=int, default=0,
        help='If > 0, shard the batch over this many devices along a "data" '
             'mesh axis with cross-device sync-BN (the TPU-native '
             'TpuBatchNormalization, utils.py:96-134).')
    return parser.parse_args(argv)


def main(argv=None):
    start = time.time()
    args = parse_args(argv)
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    if args.joint_shard_dir:
        import numpy as np
        from mliis_tpu.data.convert import load_joint_shards
        from mliis_tpu.joint.trainer import JointDataset
        tr_imgs, tr_lbls, class_names = load_joint_shards(
            args.joint_shard_dir, "train", args.image_size)
        # --test_on_val_set: monitor the val shards (reference
        # joint_train.py:126-135); otherwise the test shards.
        eval_split = "val" if args.test_on_val_set else "test"
        te_imgs, te_lbls, _ = load_joint_shards(
            args.joint_shard_dir, eval_split, args.image_size)
        assert te_imgs.shape[0], \
            "no {}_* shards in {}".format(eval_split, args.joint_shard_dir)
        train_ds = JointDataset(tr_imgs, tr_lbls.astype(np.int32),
                                class_names)
        test_ds = JointDataset(te_imgs, te_lbls.astype(np.int32),
                               class_names)
    elif args.synthetic:
        store = make_synthetic_store(num_tasks=args.synthetic_tasks,
                                     examples_per_task=10,
                                     image_size=args.image_size,
                                     seed=args.seed)
        n_test = max(args.synthetic_tasks // 4, 1)
        test_store = store.subset(range(n_test))
        train_store = store.subset(range(n_test, store.num_tasks))
        if args.test_on_val_set:
            train_names, val_names = manifests.split_train_test_tasks(
                train_store.names, max(min(args.num_val_tasks,
                                           train_store.num_tasks - 1), 1),
                reproducible_splits=True)
            test_store = train_store.subset_by_names(val_names)
            train_store = train_store.subset_by_names(train_names)
        all_classes = sorted(store.names)
    else:
        store = load_task_store(args.data_dir, image_size=args.image_size)
        train_classes, test_classes = (manifests.TRAIN_TASK_IDS,
                                       manifests.TEST_TASK_IDS)
        all_classes = sorted(list(train_classes) + list(test_classes))
        if args.fp_k_test_set:
            test_classes = manifests.FP_K_TEST_TASK_IDS
            train_classes = [x for x in all_classes if x not in test_classes]
        assert not set(test_classes) & set(train_classes), \
            "train-test class names overlap"
        present = set(store.names)
        train_names = [n for n in train_classes if n in present]
        if args.test_on_val_set:
            # Train on train-minus-val, monitor on the val classes
            # (reference joint_train.py:126-129) — keeps the TEST classes
            # out of epoch-level model selection.
            train_names, val_names = manifests.split_train_test_tasks(
                train_names, max(min(args.num_val_tasks,
                                     len(train_names) - 1), 1),
                reproducible_splits=True)
            test_classes = val_names
        train_store = store.subset_by_names(train_names)
        test_store = store.subset_by_names(
            [n for n in test_classes if n in present])

    if not args.joint_shard_dir:
        train_ds = joint_dataset_from_task_store(train_store, all_classes)
        test_ds = joint_dataset_from_task_store(test_store, all_classes)
    num_classes = train_ds.num_classes
    print("building dataset with labels with {} mask channels".format(
        num_classes + 1))

    mesh = None
    bn_axis = None
    if args.mesh_data:
        from mliis_tpu.parallel.mesh import DATA_AXIS, make_data_mesh
        mesh = make_data_mesh(args.mesh_data)
        bn_axis = DATA_AXIS
    model = EfficientLab(
        n_classes=num_classes,
        separate_background_channel=True,
        feature_extractor_name=args.feature_extractor_name,
        rsd=tuple(args.rsd) if args.rsd else None,
        final_layer_dropout_rate=args.final_layer_dropout_rate,
        bn_axis_name=bn_axis)
    opt_cfg = OptimizerConfig(name="sgd" if args.sgd else "adam")
    state = init_model_state(model, jax.random.PRNGKey(args.seed),
                             args.image_size, opt_cfg, jit_init=True)
    if args.restore_efficient_net_weights_from:
        state, _ = ckpt_lib.restore_checkpoint(
            args.restore_efficient_net_weights_from, state,
            filter_to_scopes=[args.feature_extractor_name.replace("-", "_")])

    config = JointTrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        learning_rate=args.learning_rate,
        final_learning_rate=args.final_learning_rate,
        label_smoothing=args.label_smoothing, augment=args.augment,
        l2=args.l2, eval_interval=args.eval_interval,
        val_batches=args.val_batches,
        use_pallas_augment=args_lib.pallas_augment_mode(args))
    trainer = JointTrainer(model, train_ds, test_ds, config, opt_cfg,
                           mesh=mesh)
    trainer.train(state, args.checkpoint, jax.random.PRNGKey(args.seed + 1))

    print("Finished training")
    print("Experiment took {} hours".format((time.time() - start) / 3600.0))


if __name__ == "__main__":
    main()
