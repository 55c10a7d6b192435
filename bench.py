"""Headline benchmark: meta-tasks adapted per second per chip.

Measures one full FOMAML* meta-training step at the run.sh hyperparameters
(meta-batch 5 tasks x 59 inner SGD steps x batch 8 @ 224x224, EfficientLab-6-3,
bce_dice loss, aug rate 0.5) as one fused XLA program, and compares against a
"session-style" baseline that executes the same model the way the TF1
reference does (SURVEY.md §3.1): one device dispatch per SGD step with
host-assembled batches, tasks serialized, full-model host export/import
between tasks. Both run on the same chip, so vs_baseline isolates the
architectural speedup (fused scan+vmap vs. per-step host round-trips).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def _wait_for_device(max_wait_s: float = 600.0):
    """The axon TPU tunnel can take minutes to recover after a crash; probe
    with a tiny computation before committing to the long compile."""
    import jax
    import jax.numpy as jnp
    deadline = time.time() + max_wait_s
    while True:
        try:
            x = jnp.ones((8, 128))
            jax.block_until_ready(x @ x.T)
            return
        except Exception as exc:  # noqa: BLE001 - device-recovery probe
            if time.time() > deadline:
                raise
            print("device not ready ({}); retrying".format(
                type(exc).__name__), file=sys.stderr)
            time.sleep(60)


def _peak_flops_per_chip(device) -> float:
    """Peak dense bf16 FLOP/s for the benchmark chip (for the MFU line)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 197e12,   # v5e: 197 bf16 TFLOP/s/chip
        "tpu v5e": 197e12,
        "tpu v5p": 459e12,
        "tpu v4": 275e12,
        "tpu v6e": 918e12,
    }
    for name, peak in table.items():
        if name in kind:
            return peak
    return float("nan")


def _program_flops(jitted, *args) -> float:
    """FLOPs of one compiled program via XLA cost analysis (NaN if the
    backend doesn't expose it)."""
    try:
        compiled = jitted.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:  # noqa: BLE001 - cost analysis is backend-optional
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    _wait_for_device()
    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state,
                                           make_loss_and_grad,
                                           apply_optimizer)
    from mliis_tpu.meta.learners import (MetaTrainConfig,
                                         make_chained_train_step)
    from mliis_tpu.models.efficientlab import EfficientLab

    meta_batch = 5
    inner_iters = 59
    inner_batch = 8
    image_size = 224

    store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                                 image_size=image_size, seed=0)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    # remat off: 2-task 59-step groups fit 16 GB HBM at these shapes without
    # rematerialization, which costs ~23% step time (measured 1.344 s vs
    # 1.649 s per 2-task group). Flip on for larger images/batches.
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), image_size,
                             opt_cfg)

    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=inner_batch,
                          inner_iters=inner_iters, meta_batch_size=meta_batch,
                          foml=True, tail_shots=5, aug_rate=0.5)
    # The meta-batch runs SEQUENTIALLY inside one compiled launch (lax.scan
    # over task slots) — on a real v5e-8 the 5 tasks shard across chips
    # instead (parallel/mesh.py). Round-3 group-size sweep on v5e (planar/
    # DFT augmentation, fused BN, Pallas cheap pass): per-task step time
    # RISES with vmap width (0.314 s/task at group 1, 0.352 at 2, 0.360 at
    # 3 — HBM pressure), so single-task execution wins; chaining the 5
    # single-task adaptations into ONE launch removes the ~18 ms/launch
    # host gaps and the separate combine program on top (measured 1.368 s
    # vs 1.394 s for 5x g1 launches + combine, same session).
    train_step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg,
                                                 cfg, n_max=10),
                         donate_argnums=(0,))
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)

    # Fused path.
    t0 = time.time()
    state = train_step(state, imgs, msks, cnts, jax.random.PRNGKey(1),
                       jnp.float32(0.1), jnp.float32(5e-4))
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        state = train_step(state, imgs, msks, cnts, jax.random.PRNGKey(2 + i),
                           jnp.float32(0.1), jnp.float32(5e-4))
        jax.block_until_ready(state.params)
        times.append(time.time() - t0)
    fused_step_s = min(times)
    tasks_per_sec = meta_batch / fused_step_s

    # MFU: model-math FLOPs (one fwd+bwd at the inner-loop batch, from XLA
    # cost analysis) x inner steps x meta-batch, over measured step time vs
    # the chip's peak. Model-only is the stable denominator: cost analysis
    # of the full scanned program varies with fusion shape (observed 10x
    # swings for identical math), while augmentation/optimizer FLOPs are
    # noise next to the convolutions.
    batch_images = jnp.zeros((inner_batch, image_size, image_size, 3),
                             jnp.float32)
    batch_masks = jnp.zeros((inner_batch, image_size, image_size, 2),
                            jnp.float32)
    lg_raw = make_loss_and_grad(model, loss_cfg)
    lg = jax.jit(lambda p, b, i, m: lg_raw(
        p, b, i, m, jax.random.PRNGKey(0), jnp.float32(0.5)))
    sgd_step_flops = _program_flops(lg, state.params, state.batch_stats,
                                    batch_images, batch_masks)
    step_flops = sgd_step_flops * inner_iters * meta_batch
    peak = _peak_flops_per_chip(jax.devices()[0])
    mfu = step_flops / fused_step_s / peak

    # Session-style baseline: per-SGD-step dispatch, host batch assembly,
    # serialized tasks, host export/import of the full model per task
    # (reptile.py:102-125's boundary-crossing pattern). No augmentation —
    # which only favors the baseline.
    loss_and_grad = jax.jit(make_loss_and_grad(model, loss_cfg))
    opt_apply = jax.jit(
        lambda p, g, o: apply_optimizer(p, g, o, 5e-4, opt_cfg))
    host_params = jax.tree_util.tree_map(np.asarray, state.params)  # export
    np_imgs = np.asarray(store.images[0]).astype(np.float32)
    np_msks = np.asarray(store.masks[0]).astype(np.float32)
    onehot = np.stack([255.0 - np_msks, np_msks], -1) / 255.0
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(9)

    def baseline_task(n_steps):
        # import: host -> device full-model copy
        params = jax.tree_util.tree_map(jnp.asarray, host_params)
        bn = state.batch_stats
        opt = state.opt
        for s in range(n_steps):
            sel = rng.integers(0, 10, inner_batch)
            batch_i = jnp.asarray(np_imgs[sel])       # feed_dict transfer
            batch_m = jnp.asarray(onehot[sel])
            (_, bn), grads = loss_and_grad(params, bn, batch_i, batch_m, key,
                                           jnp.float32(0.5))
            params, opt = opt_apply(params, grads, opt)
        jax.block_until_ready(params)
        return jax.tree_util.tree_map(np.asarray, params)  # export

    baseline_task(2)  # warm up compiles
    t0 = time.time()
    baseline_steps = 12  # sampled subset of the 59 steps (linear cost)
    baseline_task(baseline_steps)
    per_sgd_step = (time.time() - t0) / baseline_steps
    baseline_task_s = per_sgd_step * inner_iters
    baseline_tasks_per_sec = 1.0 / baseline_task_s

    # Eval throughput: 59-step adaptation + transductive predict per task.
    from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
    # chain_chunk: the 8 tasks run sequentially inside ONE compiled launch
    # (single-task activation footprint, no per-task launch gaps) — measured
    # 3.99 vs 2.59 tasks/s against per-task vmap-1 launches on v5e.
    eval_cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=8,
                          inner_iters=59, transductive=True, augment=True,
                          task_chunk_size=8, chain_chunk=True)
    evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg, store)
    evaluator.evaluate_tasks(state, [0], jax.random.PRNGKey(7), 5e-4,
                             aug_rate=0.5)  # compile
    n_eval = 8
    t0 = time.time()
    evaluator.evaluate_tasks(state, list(range(n_eval)),
                             jax.random.PRNGKey(8), 5e-4, aug_rate=0.5)
    eval_tasks_per_sec = n_eval / (time.time() - t0)

    vs_baseline = tasks_per_sec / baseline_tasks_per_sec
    result = {
        "metric": "meta_tasks_adapted_per_sec_per_chip",
        "value": round(tasks_per_sec, 3),
        "unit": "tasks/s/chip",
        "vs_baseline": round(vs_baseline, 2),
        "mfu": None if np.isnan(mfu) else round(mfu, 4),
        "detail": {
            "fused_meta_step_s": round(fused_step_s, 4),
            "compile_s": round(compile_s, 1),
            "meta_step_tflops": (None if np.isnan(step_flops)
                                 else round(step_flops / 1e12, 2)),
            "peak_tflops_bf16": (None if np.isnan(peak)
                                 else round(peak / 1e12, 1)),
            "session_style_task_s": round(baseline_task_s, 3),
            "eval_tasks_per_sec": round(eval_tasks_per_sec, 3),
            "config": "FOMAML* meta-batch 5 x 59 steps x bs8 @224, "
                      "EfficientLab-6-3, bce_dice, aug 0.5",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
