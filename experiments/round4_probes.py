"""Round-4 chip probes (VERDICT items 4 and 8), batched into one process.

1. 4-tap rotation under chained execution: rebuild the chained train step
   with ops.augment.FAST_ROTATE=False (the scipy-oracle-accurate 4-tap
   map_coordinates path, /root/reference/meta_learners/.../np_augmenters.py:
   100-129) and time it against the FFT-shear default at identical shapes.
   Round-1 rejected 4-tap under vmap (~3 ms/image of gathers); chained
   execution is single-task, so the gather pressure may be gone. Decision
   rule per VERDICT r3 #4: if the step-time cost is <5%, flip the default
   (buys back the measured -0.029 mIoU @100% rotation wrap-border delta,
   docs/ROTATION_RESAMPLING_DELTA.md); else record the measured cost.

2. Eval chunk width 16: the chained eval chunk (lax.map over tasks inside
   one launch) amortizes launch overhead over the chunk; round 3 measured
   4.01 tasks/s at chunk 8. Probe chunk 16 (VERDICT r3 #8 target >=4.5).

Usage (TPU, nohup per CLAUDE.md): python experiments/round4_probes.py
Writes experiments/round4_probes.json.
"""
import json
import os
import time

t0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "round4_probes.json")

META_BATCH = 5
INNER_ITERS = 59
INNER_BATCH = 8
IMAGE_SIZE = 224
if os.environ.get("PROBE_SMOKE") == "1":
    META_BATCH, INNER_ITERS, INNER_BATCH, IMAGE_SIZE = 2, 3, 4, 32


def log(*a):
    print("[{:7.1f}s]".format(time.time() - t0), *a, flush=True)


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    log("probing device...")
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    log("device ok:", jax.devices())

    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state)
    from mliis_tpu.meta.learners import MetaTrainConfig, make_chained_train_step
    from mliis_tpu.models.efficientlab import EfficientLab
    from mliis_tpu.ops import augment as aug_mod

    results = {}
    store = make_synthetic_store(num_tasks=16, examples_per_task=10,
                                 image_size=IMAGE_SIZE, seed=0)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, 0, IMAGE_SIZE, opt_cfg, jit_init=True)
    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=INNER_BATCH,
                          inner_iters=INNER_ITERS, meta_batch_size=META_BATCH,
                          foml=True, tail_shots=5, aug_rate=0.5)
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)

    import numpy as np

    def sync(st):
        # Fetch one output leaf: block_until_ready does not block through
        # the round-4 rebuilt axon tunnel (see bench.py); a device->host
        # fetch waits on the true data dependency.
        np.asarray(jax.tree_util.tree_leaves(st.params)[0])

    def time_chained(tag, state_in):
        step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg, cfg,
                                               n_max=10),
                       donate_argnums=(0,))
        tc = time.time()
        st = step(state_in, imgs, msks, cnts, jax.random.PRNGKey(1),
                  jnp.float32(0.1), jnp.float32(5e-4))
        sync(st)
        compile_s = time.time() - tc
        n_timed = 3
        ts = time.time()
        for i in range(n_timed):
            st = step(st, imgs, msks, cnts, jax.random.PRNGKey(2 + i),
                      jnp.float32(0.1), jnp.float32(5e-4))
        sync(st)
        step_s = (time.time() - ts) / n_timed
        log(tag, "compile {:.1f}s step {:.4f}s (3-step window)".format(
            compile_s, step_s))
        return {"compile_s": round(compile_s, 1), "step_s": round(step_s, 4)}

    # --- probe 1: 4-tap rotation vs FFT-shear default, chained step ---
    state_copy = jax.tree_util.tree_map(jnp.array, state)
    results["fft_shear_default"] = time_chained("fft-shear", state_copy)
    aug_mod.FAST_ROTATE = False
    state_copy = jax.tree_util.tree_map(jnp.array, state)
    results["four_tap"] = time_chained("4-tap", state_copy)
    aug_mod.FAST_ROTATE = True
    slow = results["four_tap"]["step_s"]
    fast = results["fft_shear_default"]["step_s"]
    results["four_tap_cost_pct"] = round(100.0 * (slow - fast) / fast, 2)
    log("4-tap cost: {:+.2f}%".format(results["four_tap_cost_pct"]))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)

    # --- probe 2: eval chunk width sweep (8 vs 16, chained chunks) ---
    from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
    n_eval = 16
    for chunk in (8, 16):
        eval_cfg = EvalConfig(num_shots=5, test_shots=5,
                              inner_batch_size=INNER_BATCH,
                              inner_iters=INNER_ITERS, transductive=True,
                              augment=True, task_chunk_size=chunk,
                              chain_chunk=True)
        ev = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg, store)
        tc = time.time()
        ev.evaluate_tasks(state, list(range(n_eval)), jax.random.PRNGKey(7),
                          5e-4, aug_rate=0.5)  # compile
        compile_s = time.time() - tc
        ts = time.time()
        ev.evaluate_tasks(state, list(range(n_eval)), jax.random.PRNGKey(8),
                          5e-4, aug_rate=0.5)
        tps = n_eval / (time.time() - ts)
        log("eval chunk", chunk, "compile {:.1f}s -> {:.3f} tasks/s".format(
            compile_s, tps))
        results["eval_chunk_{}".format(chunk)] = {
            "compile_s": round(compile_s, 1), "tasks_per_s": round(tps, 3)}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
