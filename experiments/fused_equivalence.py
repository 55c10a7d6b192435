"""On-chip distributional equivalence of the fused single-launch
augmentation vs the split (pre/rotate/post) pallas path vs the jnp path.

The fused kernel reuses the split kernels' branch builders and the XLA
rotation's parameter distributions, but draws from ONE on-core stream per
sample (vs two) and generates rotation border noise in-kernel — so outputs
are distributionally, not bitwise, equivalent. This script checks the
moments and invariants that the round-2 cheap-pass adoption used:
per-channel mean/std of augmented images, fraction of samples changed
(the aug-rate gate), mask one-hot exactness, and mask foreground-area
distribution, over N independent keys on the real chip.

Usage: nohup python experiments/fused_equivalence.py > /tmp/equiv.log 2>&1 &
Writes experiments/fused_equivalence.json; nonzero exit on failure.
"""
import json
import os
import sys
import time

t0 = time.time()


def log(*a):
    print("[{:8.1f}s]".format(time.time() - t0), *a, flush=True)


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    log("device:", jax.devices())
    on_tpu = jax.default_backend() == "tpu"

    from mliis_tpu.ops.augment import augment_batch, augment_batch_pallas

    rng = np.random.default_rng(0)
    b, hw = 16, 224 if on_tpu else 32
    reps = 24 if on_tpu else 4
    images = jnp.asarray(rng.integers(0, 256, (b, hw, hw, 3)).astype(
        np.float32))
    fg = (rng.random((b, hw, hw)) > 0.5).astype(np.float32)
    masks = jnp.asarray(np.stack([1.0 - fg, fg], axis=-1))

    def stats_for(fn):
        means, stds, changed, fgarea, onehot_err = [], [], [], [], 0.0
        for r in range(reps):
            i, m = jax.jit(fn)(jax.random.PRNGKey(1000 + r))
            i = np.asarray(i)
            m = np.asarray(m)
            means.append(i.mean())
            stds.append(i.std())
            changed.append(
                float((np.abs(i - np.asarray(images)).max(axis=(1, 2, 3))
                       > 1e-3).mean()))
            fgarea.append(float(m[..., 1].mean()))
            onehot_err = max(onehot_err,
                             float(np.abs(m.sum(-1) - 1.0).max()))
        return {"mean": float(np.mean(means)), "std": float(np.mean(stds)),
                "changed_frac": float(np.mean(changed)),
                "fg_area": float(np.mean(fgarea)),
                "onehot_err": onehot_err,
                "n_samples": reps * b}

    paths = {
        "jnp": lambda k: augment_batch(k, images, masks, 0.5),
        "split": lambda k: augment_batch_pallas(k, images, masks, 0.5,
                                                fused=False),
        "fused": lambda k: augment_batch_pallas(k, images, masks, 0.5,
                                                fused=True),
    }
    results = {"device": str(jax.devices()[0])}
    for name, fn in paths.items():
        results[name] = stats_for(fn)
        log(name, json.dumps(results[name]))

    # Equivalence bars (384 samples/path): the gate is exactly 1/2; image
    # moments move with the random aug draws, so allow small deltas.
    ok = True
    for a, bname in (("jnp", "fused"), ("split", "fused")):
        ra, rb = results[a], results[bname]
        checks = [
            abs(ra["changed_frac"] - rb["changed_frac"]) < 0.08,
            abs(ra["mean"] - rb["mean"]) / ra["mean"] < 0.03,
            abs(ra["std"] - rb["std"]) / ra["std"] < 0.05,
            abs(ra["fg_area"] - rb["fg_area"]) < 0.03,
            rb["onehot_err"] < 1e-3,
        ]
        results["{}_vs_{}_ok".format(a, bname)] = all(checks)
        ok = ok and all(checks)
    results["passed"] = ok
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fused_equivalence.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    log("RESULT", json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
