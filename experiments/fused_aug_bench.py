"""On-chip validation + timing of the single-launch fused augmentation
kernel (VERDICT r4 item 3: the 118-launch cheap-pass overhead class).

One TPU process, three measurements (CLAUDE.md: batch all chip work):
  1. Mosaic validation: compile + run ops/pallas_augment.full_pass directly
     with a rotation-first permutation (interpret mode does not validate
     TPU lowering); check finiteness + mask one-hot on the output.
  2. Augmentation micro-bench: augment_batch_pallas fused vs split on the
     bench batch shape [8, 224, 224, 3], 59 reps in a lax.scan to mimic the
     inner loop's launch pattern per task.
  3. Step-level: the bench.py chained FOMAML* step (5 tasks x 59 iters)
     with PALLAS_FUSED_SINGLE_LAUNCH False (the shipping program, warm
     cache) vs True (new program, cold compile) — the number that decides
     the default.

Usage: nohup python experiments/fused_aug_bench.py > /tmp/fused.log 2>&1 &
Writes experiments/fused_aug_bench.json.
"""
import json
import os
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
    log("probing device...")
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    log("device ok:", jax.devices())
    on_tpu = jax.default_backend() == "tpu"

    from mliis_tpu.ops import augment
    from mliis_tpu.ops.pallas_augment import full_pass

    results = {"device": str(jax.devices()[0])}

    # ---- 1. Mosaic validation of full_pass ----
    rng = np.random.default_rng(0)
    b, hw = 8, 224 if on_tpu else 32
    imgs = rng.integers(0, 256, (b, 3, hw, hw)).astype(np.float32)
    fg = (rng.random((b, 1, hw, hw)) > 0.5).astype(np.float32)
    x = jnp.asarray(np.concatenate([imgs, 1.0 - fg, fg], axis=1))
    perm = jnp.tile(jnp.asarray([[5, 0, 1, 2, 3, 4]], jnp.int32), (b, 1))
    nums = jnp.full((b,), 6, jnp.int32)
    rot = jnp.tile(jnp.asarray([[30, 1, 1, 100]], jnp.int32), (b, 1))
    seeds = jnp.arange(b, dtype=jnp.int32)
    import contextlib
    from jax.experimental.pallas import tpu as pltpu

    def ctx():
        # Off-TPU the on-core PRNG primitives only exist in the TPU
        # interpreter (same discipline as augment_batch_pallas).
        return (contextlib.nullcontext() if on_tpu
                else pltpu.force_tpu_interpret_mode())

    t = time.time()
    with ctx():
        out = np.asarray(jax.jit(
            lambda s, v, p, n, r: full_pass(s, v, p, n, r,
                                            interpret=not on_tpu)
        )(seeds, x, perm, nums, rot))
    results["full_pass_compile_and_run_s"] = round(time.time() - t, 1)
    assert np.isfinite(out).all(), "non-finite full_pass output"
    onehot_err = float(np.abs(out[:, 3] + out[:, 4] - 1.0).max())
    assert onehot_err < 1e-3, onehot_err
    results["full_pass_mosaic_ok"] = True
    log("full_pass compiles + runs on chip:",
        results["full_pass_compile_and_run_s"], "s")

    # ---- 2. Augmentation micro-bench (59-rep scan per launch) ----
    images = jnp.asarray(rng.integers(0, 256, (b, hw, hw, 3)).astype(
        np.float32))
    masks = jnp.asarray(np.concatenate([1.0 - fg, fg], axis=1)
                        .transpose(0, 2, 3, 1))

    def scan_aug(fused):
        def body(c, k):
            i, m = augment.augment_batch_pallas(k, images, masks, 0.5,
                                                fused=fused)
            return c + jnp.float32(i.mean() + m.mean()), None

        def fn(key):
            ks = jax.random.split(key, 59)
            return jax.lax.scan(body, jnp.float32(0.0), ks)[0]
        return jax.jit(fn)

    for fused in (False, True):
        fn = scan_aug(fused)
        t = time.time()
        jax.block_until_ready(fn(jax.random.PRNGKey(0)))
        compile_s = time.time() - t
        t = time.time()
        reps = 5
        for i in range(reps):
            out_s = fn(jax.random.PRNGKey(1 + i))
        float(out_s)  # sync by fetch
        name = "fused" if fused else "split"
        results["aug59_{}_compile_s".format(name)] = round(compile_s, 1)
        results["aug59_{}_s".format(name)] = round(
            (time.time() - t) / reps, 4)
        log("aug scan", name, results["aug59_{}_s".format(name)], "s/launch")

    # ---- 3. Chained train step, split vs fused ----
    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state)
    from mliis_tpu.meta.learners import (MetaTrainConfig,
                                         make_chained_train_step)
    from mliis_tpu.models.efficientlab import EfficientLab

    inner_iters = 59 if on_tpu else 3
    store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                                 image_size=hw, seed=0)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=8,
                          inner_iters=inner_iters, meta_batch_size=5,
                          foml=True, tail_shots=5, aug_rate=0.5)
    imgs_s = jnp.asarray(store.images)
    msks_s = jnp.asarray(store.masks)
    cnts_s = jnp.asarray(store.counts)

    def sync(st):
        np.asarray(jax.tree_util.tree_leaves(st.params)[0])

    import dataclasses
    variants = (
        ("split", False, False),            # shipping round-4 program
        ("fused", True, False),             # 1 launch/iter, rotation in-kernel
        ("precompute_fused", True, True),   # all 59 batches in ONE launch
    )
    for name, fused, precompute in variants:
        augment.PALLAS_FUSED_SINGLE_LAUNCH = fused
        cfg_i = dataclasses.replace(cfg, precompute_augment=precompute,
                                    pallas_augment=True)
        state = init_model_state(model, 0, hw, opt_cfg, jit_init=True)
        step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg,
                                               cfg_i, n_max=10),
                       donate_argnums=(0,))
        t = time.time()
        state = step(state, imgs_s, msks_s, cnts_s, jax.random.PRNGKey(1),
                     jnp.float32(0.1), jnp.float32(5e-4))
        sync(state)
        compile_s = time.time() - t
        t = time.time()
        n = 3
        for i in range(n):
            state = step(state, imgs_s, msks_s, cnts_s,
                         jax.random.PRNGKey(2 + i), jnp.float32(0.1),
                         jnp.float32(5e-4))
        sync(state)
        results["step_{}_compile_s".format(name)] = round(compile_s, 1)
        results["step_{}_s".format(name)] = round((time.time() - t) / n, 4)
        log("chained step", name, results["step_{}_s".format(name)], "s")

    for name in ("fused", "precompute_fused"):
        results["step_{}_speedup_pct".format(name)] = round(
            100.0 * (results["step_split_s"]
                     / results["step_{}_s".format(name)] - 1.0), 2)
        results["tasks_per_sec_{}".format(name)] = round(
            5.0 / results["step_{}_s".format(name)], 3)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fused_aug_bench.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log("RESULT", json.dumps(results))


if __name__ == "__main__":
    main()
