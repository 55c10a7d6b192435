"""Real-TPU learning-evidence run v2 (round 4, VERDICT item 5).

Meta-trains the flagship configuration (EfficientLab-6-3, FOMAML*, chained
step, run.sh hyperparameters) on synthetic tasks whose shape families are
DISJOINT from the meta-test families, then asserts the meta-init's k-shot
adaptation on held-out families beats random init with a 95% CI that
excludes zero. The comparison is PAIRED: the random-init baseline and every
meta-init evaluation reuse the same per-task episode keys, so the same
support/query splits and augmentation draws are scored for both inits.

Stands in for the reference's run.sh -> ~0.87 FSS-1000 recipe
(/root/reference/run.sh:8-17) while the dataset blobs are stripped.

Usage (TPU, via nohup — see CLAUDE.md TPU rules):
    python experiments/tpu_curve_v2.py --meta_iters 3000 --out /tmp/curve_v2
"""
import argparse
import json
import os
import time

t0 = time.time()


def log(*a):
    print("[{:8.1f}s]".format(time.time() - t0), *a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta_iters", type=int, default=3000)
    p.add_argument("--eval_every", type=int, default=250)
    p.add_argument("--train_tasks", type=int, default=40)
    p.add_argument("--test_tasks", type=int, default=12)
    p.add_argument("--eval_samples", type=int, default=3)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--deadline_s", type=float, default=4.5 * 3600)
    p.add_argument("--out", type=str, default="/tmp/curve_v2")
    p.add_argument("--inner_iters", type=int, default=59,
                   help="inner adaptation steps (run.sh default; shrink for "
                        "CPU smoke tests)")
    p.add_argument("--meta_batch", type=int, default=5)
    p.add_argument("--seed", type=int, default=0,
                   help="replication seed: offsets the synthetic-store "
                        "draws (train AND held-out tasks), the model init, "
                        "and the training key stream (0 = the original "
                        "round-4/5 run exactly). Within a run the eval "
                        "episode keys stay fixed, so the baseline/meta-init "
                        "comparison remains paired.")
    p.add_argument("--resume", action="store_true",
                   help="continue from the checkpoint in --out (written at "
                        "every eval interval) — rescues a run the axon "
                        "tunnel killed mid-way; baseline/curve reload from "
                        "the flushed artifacts")
    args = p.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize sets jax_platforms directly on jax.config, which
        # outranks the env var — honor an explicit CPU request (smoke
        # testing while the TPU is busy) by re-forcing the config.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    log("probing device...")
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    log("device ok:", jax.devices())

    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state)
    from mliis_tpu.meta.learners import (MetaTrainConfig,
                                         make_chained_train_step,
                                         meta_step_size_schedule)
    from mliis_tpu.models.efficientlab import EfficientLab

    TRAIN_FAMILIES = ("rect", "ellipse", "cross", "stripes", "lshape")
    TEST_FAMILIES = ("triangle", "ring", "diamond")

    store = make_synthetic_store(num_tasks=args.train_tasks,
                                 examples_per_task=10,
                                 image_size=args.image_size,
                                 seed=1000 * args.seed,
                                 shapes=TRAIN_FAMILIES)
    test_store = make_synthetic_store(num_tasks=args.test_tasks,
                                      examples_per_task=10,
                                      image_size=args.image_size,
                                      seed=777 + 1000 * args.seed,
                                      shapes=TEST_FAMILIES)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=8,
                          inner_iters=args.inner_iters,
                          meta_batch_size=args.meta_batch, foml=True,
                          tail_shots=5, aug_rate=0.5)
    LR = 5e-4
    state = init_model_state(model, args.seed, args.image_size, opt_cfg,
                             jit_init=True)
    init_state = jax.tree_util.tree_map(jnp.array, state)  # random-init copy

    eval_cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=8,
                          inner_iters=args.inner_iters, transductive=True,
                          augment=True, task_chunk_size=8, chain_chunk=True)
    evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg, test_store)

    def paired_eval(st):
        """args.eval_samples x test_tasks per-task IoUs with FIXED episode
        keys (sample s always uses key fold(9000+s)) -> paired comparisons."""
        rows = []
        for s in range(args.eval_samples):
            ious = evaluator.evaluate_tasks(
                st, list(range(test_store.num_tasks)),
                jax.random.PRNGKey(9000 + s), LR, aug_rate=0.5)
            rows.append(ious)
        return np.stack(rows)  # [samples, tasks]

    def task_level_ci(mat):
        """Paired task-level stats vs the random-init baseline.

        Eval samples of the SAME held-out task are correlated (ADVICE r4), so
        cluster the [samples, tasks] paired diffs to per-task means and use a
        t-interval with ddof=1 (conservative at n=12 tasks).
        Returns (mean_diff, ci95_halfwidth, n_tasks).
        """
        from scipy import stats as sps
        per_task = np.nanmean(mat - baseline, axis=0)
        per_task = per_task[np.isfinite(per_task)]
        n_t = len(per_task)
        hw = float(sps.t.ppf(0.975, n_t - 1)
                   * np.std(per_task, ddof=1) / np.sqrt(n_t))
        return float(np.mean(per_task)), hw, n_t

    from mliis_tpu.utils import checkpoint as ckpt_lib

    os.makedirs(args.out, exist_ok=True)
    baseline_path = os.path.join(args.out, "baseline.npy")
    curve_path = os.path.join(args.out, "curve.json")
    start_iter = 0
    resume_path = None
    if args.resume:
        try:
            resume_path = ckpt_lib.latest_checkpoint(args.out)
        except FileNotFoundError:
            log("--resume: no checkpoint in", args.out, "- starting fresh")
    if resume_path is not None:
        state, meta = ckpt_lib.restore_checkpoint(resume_path, state)
        start_iter = int(meta.get("step", 0))
        baseline = np.load(baseline_path)
        with open(curve_path) as f:
            curve = json.load(f)
        log("resumed from iter", start_iter)
    else:
        log("evaluating random-init baseline on held-out families...")
        baseline = paired_eval(init_state)
        np.save(baseline_path, baseline)
        curve = [[0, float(np.nanmean(baseline))]]
        log("baseline mean IoU:", round(float(np.nanmean(baseline)), 4))

    train_step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg,
                                                 cfg, n_max=10),
                         donate_argnums=(0,))
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)

    # The training key stream is replayable, so a resumed run draws exactly
    # the keys the uninterrupted run would have.
    key = jax.random.PRNGKey(42 + args.seed)
    for _ in range(start_iter):
        key, _ = jax.random.split(key)

    t_train0 = time.time()
    done_iters = start_iter

    def _write_partial(error=None):
        with open(os.path.join(args.out, "result.json"), "w") as f:
            json.dump({"partial": True, "error": error,
                       "meta_iters_done": done_iters, "curve": curve,
                       "baseline_mean_iou": float(np.nanmean(baseline)),
                       "wall_s": round(time.time() - t0, 1)}, f, indent=1)

    try:
        for i in range(start_iter, args.meta_iters):
            ms = meta_step_size_schedule(i, args.meta_iters, 0.1, 1e-5)
            key, k = jax.random.split(key)
            state = train_step(state, imgs, msks, cnts, k, jnp.float32(ms),
                               jnp.float32(LR))
            done_iters = i + 1
            if (done_iters % args.eval_every == 0
                    or done_iters == args.meta_iters):
                jax.block_until_ready(state.params)
                test_ious = paired_eval(state)
                d_mean, d_ci, _ = task_level_ci(test_ious)
                # entry: [iter, mean IoU, task-level paired diff, its CI95]
                curve.append([done_iters, float(np.nanmean(test_ious)),
                              d_mean, d_ci])
                rate = ((done_iters - start_iter)
                        / (time.time() - t_train0))
                log("iter", done_iters, "held-out IoU",
                    round(curve[-1][1], 4), "({:.2f} it/s)".format(rate))
                with open(curve_path, "w") as f:
                    json.dump(curve, f)
                ckpt_lib.save_checkpoint(args.out, state, done_iters,
                                         max_to_keep=1)
            if time.time() - t0 > args.deadline_s:
                log("deadline reached at iter", done_iters)
                break
    except Exception as exc:  # noqa: BLE001 - tunnel faults must not lose the run
        log("FATAL at iter", done_iters, "-", repr(exc))
        _write_partial(error=repr(exc))
        raise SystemExit(3)  # nonzero: the wrapper may retry with --resume

    log("final paired evaluation...")
    final = paired_eval(state)
    diffs = (final - baseline).ravel()
    diffs = diffs[np.isfinite(diffs)]
    mean_d = float(np.mean(diffs))
    ci = float(1.96 * np.std(diffs) / np.sqrt(len(diffs)))
    # Headline CI (ADVICE r4): task-level clustered t-interval — see
    # task_level_ci.
    mean_t, ci_t, n_t = task_level_ci(final)
    out = {
        "config": ("EfficientLab-6-3 FOMAML* chained, run.sh shapes; "
                   "train families {} x {} tasks; DISJOINT test families {} "
                   "x {} tasks; paired eval keys".format(
                       TRAIN_FAMILIES, args.train_tasks, TEST_FAMILIES,
                       args.test_tasks)),
        "seed": args.seed,
        "meta_iters_done": done_iters,
        "baseline_mean_iou": float(np.nanmean(baseline)),
        "final_mean_iou": float(np.nanmean(final)),
        "paired_diff_mean": mean_d,
        "paired_diff_ci95": ci,
        "ci_excludes_zero": bool(mean_d - ci > 0),
        "n_pairs": int(len(diffs)),
        "task_level_diff_mean": mean_t,
        "task_level_ci95_t": ci_t,
        "task_level_ci_excludes_zero": bool(mean_t - ci_t > 0),
        "n_tasks": int(n_t),
        "curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
