"""Numeric cross-check: OUR EfficientLab vs the REFERENCE's TF1 graph.

The ≈0.87 mIoU parity target is blocked in this environment (FSS-1000 blobs
and the published checkpoint are stripped), but the MODEL-MATH half of that
risk is checkable without them: build the reference's own EfficientLab graph
(/root/reference/models/efficientlab.py) under tf.compat.v1 with a
tf.contrib.tpu shim, initialize it, export every variable, import them into
our flax model through the production TF1 name map
(models/tf1_import.convert_tf1_vars), and compare the inference forward on
the same input. Agreement proves: architecture wiring, ImageNet
normalization, MBConv/SE topology, RSD decoder, the always-training decoder
BNs, align-corners resize, softmax — i.e. everything between a checkpoint
and a prediction.

Usage (CPU, ~2-4 min):
    python experiments/tf1_numeric_crosscheck.py [--image_size 64]
Writes experiments/tf1_numeric_crosscheck.json and exits nonzero if the
max|probs_ours - probs_ref| exceeds the threshold.
"""
import argparse
import json
import os
import sys
import types

import numpy as np

THRESHOLD = 2e-4  # f32 forward, different conv backends/reduction orders


def build_reference_outputs(image_size, seed, batch, extractor, rsd,
                            save_ckpt_dir=None):
    """Build + run the reference graph; returns ({tf_name: np}, x, y,
    probs, loss). With save_ckpt_dir, also writes a real
    tf.compat.v1.train.Saver checkpoint of the live graph (step 123) —
    the fixture for the checkpoint-converter roundtrip test."""
    os.environ["TF_USE_LEGACY_KERAS"] = "1"  # Keras 2 (TF1-graph capable)
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    import tensorflow as tf2
    tf1 = tf2.compat.v1
    tf1.disable_v2_behavior()
    tf1.disable_eager_execution()

    # tf.contrib.tpu shim: the reference's TpuBatchNormalization imports it
    # (utils.py:26-27) but runs degenerate off-TPU (num_shards None ->
    # local moments, utils.py:116-117).
    def _module(name):
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        return mod

    contrib = _module("tensorflow.contrib")
    tpu = _module("tensorflow.contrib.tpu")
    python = _module("tensorflow.contrib.tpu.python")
    ops = _module("tensorflow.contrib.tpu.python.ops")
    tpu_ops = _module("tensorflow.contrib.tpu.python.ops.tpu_ops")
    tpu_pkg = _module("tensorflow.contrib.tpu.python.tpu")
    tpu_function = _module("tensorflow.contrib.tpu.python.tpu.tpu_function")
    tpu_ops.cross_replica_sum = lambda x, group_assignment=None: x

    class _Ctx:
        number_of_shards = None

    tpu_function.get_tpu_context = lambda: _Ctx()
    contrib.tpu = tpu
    tpu.python = python
    python.ops = ops
    python.tpu = tpu_pkg
    ops.tpu_ops = tpu_ops
    tpu_pkg.tpu_function = tpu_function

    # The reference is TF 1.15 code ("import tensorflow as tf" + TF1 APIs):
    # alias the root module to compat.v1 for its imports.
    real_tf = sys.modules["tensorflow"]
    sys.modules["tensorflow"] = tf1
    sys.path.insert(0, "/root/reference")
    try:
        # TF-1.15-era keras: _moments had no `mask` kwarg; tf_keras passes
        # one. Adapt the reference override's signature (mask is unused in
        # the degenerate single-shard path it takes here).
        import models.efficientnet.utils as ref_utils
        orig_moments = ref_utils.TpuBatchNormalization._moments

        def _moments(self, inputs, reduction_axes, keep_dims, **_kwargs):
            return orig_moments(self, inputs, reduction_axes, keep_dims)

        ref_utils.TpuBatchNormalization._moments = _moments

        from models.efficientlab import EfficientLab as RefLab
        ref = RefLab(is_training=False, n_classes=1, n_rows=image_size,
                     n_cols=image_size, feature_extractor_name=extractor,
                     rsd=list(rsd), final_layer_dropout_rate=0.5,
                     learning_rate=5e-4, label_smoothing=0.0)
        rng = np.random.default_rng(seed)
        x = (rng.uniform(0, 255, size=(batch, image_size, image_size, 3))
             .astype(np.float32))
        m = (rng.uniform(0, 1, size=(batch, image_size, image_size))
             > 0.5).astype(np.float32)
        y = np.stack([1.0 - m, m], axis=-1)  # [255-m, m]/255 one-hot form
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            tf_vars = {}
            for v in tf1.global_variables():
                tf_vars[v.name.split(":")[0]] = sess.run(v)
            # Host replication of the reference l2 term
            # (models/regularizers.py:4-10): trainable vars without
            # 'batch_normalization' in the name.
            ref_l2 = 0.0
            for v in tf1.trainable_variables():
                if "batch_normalization" not in v.name:
                    val = np.asarray(tf_vars[v.name.split(":")[0]],
                                     np.float64)
                    ref_l2 += 0.0005 * float((val ** 2).sum()) / 2.0
            probs, loss = sess.run(
                [ref.probabilities, ref.loss],
                {ref.input_ph: x, ref.label_ph: y,
                 ref.is_training_ph: False})
            if save_ckpt_dir is not None:
                os.makedirs(save_ckpt_dir, exist_ok=True)
                tf1.train.Saver().save(
                    sess, os.path.join(save_ckpt_dir, "model.ckpt"),
                    global_step=123)
        return tf_vars, x, y, probs, float(loss), ref_l2
    finally:
        sys.modules["tensorflow"] = real_tf
        sys.path.remove("/root/reference")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--feature_extractor", type=str, default="efficientnet-b0")
    p.add_argument("--rsd", type=int, nargs="+", default=[2, 4])
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if args.out is None:
        args.out = os.path.join(
            os.path.dirname(__file__),
            "tf1_numeric_crosscheck_{}.json".format(
                args.feature_extractor.replace("efficientnet-", "")))

    (tf_vars, x, y, ref_probs, ref_loss,
     ref_l2) = build_reference_outputs(
        args.image_size, args.seed, args.batch, args.feature_extractor,
        args.rsd)
    print("reference graph: {} variables, probs {}, loss {} (l2 {})".format(
        len(tf_vars), ref_probs.shape, ref_loss, ref_l2), flush=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
    from mliis_tpu.models import tf1_import
    from mliis_tpu.models.efficientlab import EfficientLab
    from mliis_tpu.utils import checkpoint as ckpt_lib

    from mliis_tpu.ops.losses import l2_term, segmentation_loss

    model = EfficientLab(feature_extractor_name=args.feature_extractor,
                         rsd=tuple(args.rsd), final_layer_dropout_rate=0.5)
    state = init_model_state(model, 0, args.image_size,
                             OptimizerConfig(name="sgd"), jit_init=True)
    target = tf1_import.flat_state_paths(state.params, state.batch_stats)
    converted = tf1_import.convert_tf1_vars(
        tf_vars, backbone_scope=args.feature_extractor, target_paths=target)
    # The tf_keras-era reference graph materializes variables for blocks
    # past max_block_num (TF 1.15 left unbuilt layers variable-less); they
    # are unused by the truncated forward — drop them, then require full
    # coverage of OUR tree.
    extra = [k for k in converted if k not in target]
    converted = {k: v for k, v in converted.items() if k in target}
    if extra:
        # tf_keras materializes variables for blocks past max_block_num
        # that TF 1.15 never built; they are unused by the truncated
        # forward but inflate the reference graph's l2 term — the loss
        # comparison below therefore subtracts each side's own l2 and
        # compares the forward-dependent CE+dice part.
        print("ignoring {} reference vars beyond max_block_num".format(
            len(extra)), flush=True)
    tf1_import.assert_complete_import(converted, state.params,
                                      state.batch_stats)
    flat = dict(converted)
    params = ckpt_lib.unflatten_into(state.params, flat, "params/",
                                     strict=True)
    batch_stats = ckpt_lib.unflatten_into(state.batch_stats, flat,
                                          "batch_stats/", strict=True)

    def fwd(v, im, msk):
        logits, probs = model.apply(v, im, train=False)
        loss = segmentation_loss(logits, probs, msk, v["params"],
                                 label_smoothing=0.0, dice=True, l2=True)
        return probs, loss, l2_term(v["params"])

    ours, our_loss, our_l2 = jax.jit(fwd)(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        jnp.asarray(y))
    ours = np.asarray(ours)

    diff = np.abs(ours - ref_probs)
    # Compare the forward-dependent CE+dice part; each side's l2 covers a
    # different variable set (the shim's post-truncation blocks), which is
    # a graph-construction artifact, not model math.
    ce_dice_ref = ref_loss - ref_l2
    ce_dice_ours = float(our_loss) - float(our_l2)
    loss_rel = (abs(ce_dice_ours - ce_dice_ref)
                / max(abs(ce_dice_ref), 1e-9))
    out = {
        "image_size": args.image_size,
        "batch": args.batch,
        "feature_extractor": args.feature_extractor,
        "rsd": list(args.rsd),
        "n_reference_vars": len(tf_vars),
        "max_abs_prob_diff": float(diff.max()),
        "mean_abs_prob_diff": float(diff.mean()),
        "ce_dice_reference": ce_dice_ref,
        "ce_dice_ours": ce_dice_ours,
        "ce_dice_rel_diff": loss_rel,
        "l2_reference_all_trainables": ref_l2,
        "l2_ours_imported_set": float(our_l2),
        "threshold": THRESHOLD,
        "passed": bool(diff.max() <= THRESHOLD and loss_rel <= 1e-5),
        "config": "reference TF1 graph (tf.compat.v1 + tf_keras legacy) vs "
                  "mliis_tpu flax, identical variables via "
                  "models/tf1_import, is_training=False forward + "
                  "CE+dice loss on the same labels (l2 compared per "
                  "variable set)",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    if not out["passed"]:
        print("CROSSCHECK FAILED: max diff {} > {}".format(diff.max(),
                                                           THRESHOLD))
        sys.exit(1)


if __name__ == "__main__":
    main()
