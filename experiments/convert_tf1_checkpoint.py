"""Turnkey TF1 Saver checkpoint -> mliis_tpu npz converter.

The reference's published artifact is a TF1 `tf.train.Saver` checkpoint
directory (EfficientLab-6-3_FOMAML-star_checkpoint: /root/reference/run.sh:6,
restore path run_metasegnet.py:131-133, utils/util.py:42-50). Our import
stack (models/tf1_import.py) consumes "an npz conversion produced offline" —
this script IS that offline step, plus the full pipeline to a checkpoint our
CLI restores directly:

  --format raw   -> {tf1_var_name: array} npz, the input contract of
                    tf1_import.load_tf1_checkpoint_vars.
  --format flax  -> build the target EfficientLab tree, resolve the TF1
                    auto-numbering ambiguities against it
                    (tf1_import.convert_tf1_vars(target_paths=...)), assert
                    the import covers EVERY params/batch_stats leaf, and
                    write `model.ckpt-<step>.npz` that
                    utils/checkpoint.restore_checkpoint / `--pretrained`
                    load with no further translation. Optimizer slots start
                    fresh (SGD has none; the reference's eval recipe never
                    restores Adam slots either).

Checkpoint resolution mirrors the reference's relative-path handling
(utils/util.py:42-50): a directory is resolved via its `checkpoint` proto
file / tf.train.latest_checkpoint; a file prefix is used as-is.

Usage:
  python experiments/convert_tf1_checkpoint.py --ckpt <dir-or-prefix> \
      --out /tmp/converted [--format flax] [--feature_extractor
      efficientnet-b0] [--rsd 2 4] [--n_classes 1] [--use_ema]

Requires tensorflow (any TF2 with compat APIs) for reading only; the write
path is numpy. Tested end-to-end against a real Saver checkpoint of the
reference's own graph in tests/test_tf1_checkpoint_converter.py.
"""
import argparse
import json
import os
import re
import sys

import numpy as np


def resolve_checkpoint_prefix(path):
    """Directory or prefix -> Saver checkpoint prefix (util.py:42-50)."""
    import tensorflow as tf
    if os.path.isdir(path):
        latest = tf.train.latest_checkpoint(path)
        if latest is None:
            # Relative-path `checkpoint` proto entries from a moved dir:
            # parse the basename ourselves like the reference does.
            proto = os.path.join(path, "checkpoint")
            if not os.path.exists(proto):
                raise FileNotFoundError(
                    "no `checkpoint` file in {}".format(path))
            with open(proto) as f:
                first = f.readline()
            m = re.search(r'model_checkpoint_path:\s*"([^"]+)"', first)
            if not m:
                raise ValueError("unparseable checkpoint proto: " + first)
            latest = os.path.join(path, os.path.basename(m.group(1)))
        return latest
    return path


def read_tf1_checkpoint(prefix):
    """{tf1_var_name: np.ndarray} from a Saver checkpoint (no graph)."""
    import tensorflow as tf
    reader = tf.train.load_checkpoint(prefix)
    out = {}
    for name in reader.get_variable_to_shape_map():
        # Saver bookkeeping tensors are not model variables.
        if name.startswith("save_counter") or name == "global_step":
            continue
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def checkpoint_step(prefix):
    m = re.search(r"-(\d+)$", os.path.basename(prefix))
    return int(m.group(1)) if m else 0


def convert_to_flax_flat(tf_vars, feature_extractor, rsd, n_classes,
                         image_size, use_ema=False):
    """tf-name dict -> (flat {path: array} incl. fresh opt state, report).

    Builds the receiving model on CPU to resolve numbering ambiguities
    exactly; drops reference variables beyond max_block_num (materialized
    by tf_keras-era graphs, unused by the truncated forward) and optimizer
    slot variables, then requires full coverage of params+batch_stats.
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
    from mliis_tpu.models import tf1_import
    from mliis_tpu.models.efficientlab import EfficientLab
    from mliis_tpu.utils import checkpoint as ckpt_lib

    model = EfficientLab(feature_extractor_name=feature_extractor,
                         rsd=tuple(rsd), n_classes=n_classes)
    state = init_model_state(model, 0, image_size,
                             OptimizerConfig(name="sgd"), jit_init=True)
    target = tf1_import.flat_state_paths(state.params, state.batch_stats)

    # Adam/Momentum slots ride TF1 names like `<var>/Adam` or
    # `<var>/Momentum`; the import restores model state only.
    slot_re = re.compile(r"/(Adam(_\d+)?|Momentum|RMSProp(_\d+)?)$")
    model_vars = {k: v for k, v in tf_vars.items()
                  if not slot_re.search(k.split(":")[0])}

    converted = tf1_import.convert_tf1_vars(
        model_vars, backbone_scope=feature_extractor,
        target_paths=target, use_ema=use_ema)
    beyond = sorted(k for k in converted if k not in target)
    converted = {k: v for k, v in converted.items() if k in target}
    tf1_import.assert_complete_import(converted, state.params,
                                      state.batch_stats)

    flat = dict(converted)
    flat.update(ckpt_lib.flatten_tree(state.opt.v, "opt_v/"))
    flat["opt_step"] = np.zeros((), np.int32)
    report = {
        "n_tf_vars": len(tf_vars),
        "n_model_vars_mapped": len(converted),
        "n_slot_vars_skipped": len(tf_vars) - len(model_vars),
        "n_beyond_truncation_dropped": len(beyond),
        "use_ema": use_ema,
    }
    return flat, report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="TF1 Saver checkpoint directory or prefix")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--format", choices=("raw", "flax"), default="flax")
    p.add_argument("--feature_extractor", default="efficientnet-b0")
    p.add_argument("--rsd", type=int, nargs="+", default=[2, 4])
    p.add_argument("--n_classes", type=int, default=1)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--use_ema", action="store_true",
                   help="restore ExponentialMovingAverage shadow values "
                        "over their base variables (efficientlab.py:407-415)")
    args = p.parse_args(argv)

    prefix = resolve_checkpoint_prefix(args.ckpt)
    step = checkpoint_step(prefix)
    tf_vars = read_tf1_checkpoint(prefix)
    print("read {} variables from {}".format(len(tf_vars), prefix),
          flush=True)
    os.makedirs(args.out, exist_ok=True)

    if args.format == "raw":
        out_path = os.path.join(args.out, "tf1_vars.npz")
        np.savez(out_path, **tf_vars)
        print("wrote raw tf-name npz:", out_path)
        return out_path

    flat, report = convert_to_flax_flat(
        tf_vars, args.feature_extractor, args.rsd, args.n_classes,
        args.image_size, use_ema=args.use_ema)
    out_path = os.path.join(args.out, "model.ckpt-{}.npz".format(step))
    np.savez(out_path, **flat)
    meta = dict(report, step=step, source=prefix,
                feature_extractor=args.feature_extractor,
                rsd=list(args.rsd), n_classes=args.n_classes)
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(args.out, "checkpoint"), "w") as f:
        f.write('model_checkpoint_path: "model.ckpt-{}"\n'.format(step))
    print("wrote flax checkpoint:", out_path)
    print(json.dumps(meta, indent=1))
    return out_path


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
