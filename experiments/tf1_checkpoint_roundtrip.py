"""End-to-end proof of the TF1-checkpoint import pipeline.

Closes the last non-environment-blocked link in the published-checkpoint
eval-parity path (reference restore: run_metasegnet.py:131-133,
utils/util.py:42-50): builds the reference's OWN EfficientLab graph, saves a
real tf.compat.v1.train.Saver checkpoint of it, then runs the turnkey
converter (experiments/convert_tf1_checkpoint.py) and asserts

  1. raw mode reproduces every live graph variable bit-exactly from disk;
  2. flax mode yields a `model.ckpt-*.npz` that utils/checkpoint
     .restore_checkpoint loads with zero translation, whose forward matches
     the TF graph's probabilities to <= 2e-4 (the crosscheck threshold).

So: Saver checkpoint on disk -> npz -> our CLI's --pretrained restore is a
fully tested path; only the stripped blob itself is missing.

Usage (CPU, ~2-4 min):  python experiments/tf1_checkpoint_roundtrip.py
Writes experiments/tf1_checkpoint_roundtrip.json; exits nonzero on failure.
"""
import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tf1_numeric_crosscheck import THRESHOLD, build_reference_outputs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--feature_extractor", type=str, default="efficientnet-b0")
    p.add_argument("--rsd", type=int, nargs="+", default=[2, 4])
    p.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(__file__), "tf1_checkpoint_roundtrip.json"))
    args = p.parse_args()

    workdir = tempfile.mkdtemp(prefix="tf1_roundtrip_")
    ckpt_dir = os.path.join(workdir, "saver_ckpt")
    (tf_vars, x, y, ref_probs, _ref_loss, _ref_l2) = build_reference_outputs(
        args.image_size, args.seed, args.batch, args.feature_extractor,
        args.rsd, save_ckpt_dir=ckpt_dir)
    print("reference graph saved: {} vars -> {}".format(
        len(tf_vars), ckpt_dir), flush=True)

    import convert_tf1_checkpoint as conv

    # --- raw mode: disk roundtrip must be bit-exact vs the live graph ---
    raw_path = conv.main(["--ckpt", ckpt_dir, "--format", "raw",
                          "--out", os.path.join(workdir, "raw")])
    from mliis_tpu.models.tf1_import import load_tf1_checkpoint_vars
    raw = load_tf1_checkpoint_vars(raw_path)
    missing = sorted(set(tf_vars) - set(raw))
    assert not missing, "raw npz misses live vars: {}".format(missing[:5])
    mismatch = [k for k in tf_vars
                if not np.array_equal(raw[k], tf_vars[k])]
    assert not mismatch, "raw npz differs from live graph: {}".format(
        mismatch[:5])
    print("raw roundtrip: {} vars bit-exact".format(len(tf_vars)),
          flush=True)

    # --- flax mode: converted checkpoint -> restore_checkpoint -> forward ---
    flax_dir = os.path.join(workdir, "flax")
    conv.main(["--ckpt", ckpt_dir, "--format", "flax", "--out", flax_dir,
               "--feature_extractor", args.feature_extractor,
               "--rsd"] + [str(r) for r in args.rsd]
              + ["--image_size", str(args.image_size)])

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
    from mliis_tpu.models.efficientlab import EfficientLab
    from mliis_tpu.utils import checkpoint as ckpt_lib

    model = EfficientLab(feature_extractor_name=args.feature_extractor,
                         rsd=tuple(args.rsd))
    state = init_model_state(model, 0, args.image_size,
                             OptimizerConfig(name="sgd"), jit_init=True)
    state, meta = ckpt_lib.restore_checkpoint(flax_dir, state)
    assert meta.get("step") == 123, meta

    probs = jax.jit(lambda v, im: model.apply(v, im, train=False)[1])(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x))
    diff = float(np.abs(np.asarray(probs) - ref_probs).max())
    out = {
        "image_size": args.image_size,
        "feature_extractor": args.feature_extractor,
        "rsd": list(args.rsd),
        "n_saver_vars": len(tf_vars),
        "raw_bit_exact": True,
        "max_abs_prob_diff_after_restore": diff,
        "threshold": THRESHOLD,
        "passed": bool(diff <= THRESHOLD),
        "config": "Saver().save() of the live reference graph -> "
                  "convert_tf1_checkpoint.py (raw + flax) -> "
                  "restore_checkpoint -> forward vs the same graph's "
                  "session.run probabilities",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    if not out["passed"]:
        print("ROUNDTRIP FAILED: {} > {}".format(diff, THRESHOLD))
        sys.exit(1)


if __name__ == "__main__":
    main()
