"""AOT executable serialization probe (VERDICT r4 item 6).

The driver-scenario bench spends ~116 s of its 138 s time-to-first-JSON in
the chained step's WARM-cache load/compile (docs/PERF_NOTES.md). XLA's
persistent cache still replays HLO passes; `jax.experimental
.serialize_executable` skips them by pickling the loaded executable itself.
This probe measures whether a deserialize-and-run restart is materially
faster than the warm-cache compile through the axon backend:

  --phase save: build the EXACT bench.py chained-step program (store-8,
      224 px, run.sh config), time lower+compile (warm cache), run one
      step, serialize the executable to --dir with a fingerprint sidecar
      (jax version / device kind / config) and time a same-process
      deserialize+run as a sanity check.
  --phase load: fresh process; time from jax device-ready to first stepped
      result via deserialize_and_load. Compare against the save phase's
      compile time.

Staleness discipline mirrors utils/cache.py: the sidecar fingerprint must
match exactly or the probe refuses to load (a stale executable would run
wrong code or crash the tunnel).

Usage (ONE process at a time on the chip, via nohup):
  python experiments/aot_probe.py --phase save --dir /tmp/aot
  python experiments/aot_probe.py --phase load --dir /tmp/aot
CPU smoke: AOT_SMOKE=1 JAX_PLATFORMS=cpu python experiments/aot_probe.py ...
"""
import argparse
import json
import os
import pickle
import time

t0 = time.time()
SMOKE = os.environ.get("AOT_SMOKE", "") == "1"


def log(*a):
    print("[{:8.1f}s]".format(time.time() - t0), *a, flush=True)


def build(jax, jnp):
    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                           init_model_state)
    from mliis_tpu.meta.learners import (MetaTrainConfig,
                                         make_chained_train_step)
    from mliis_tpu.models.efficientlab import EfficientLab

    if SMOKE:
        meta_batch, inner_iters, inner_batch, image = 2, 3, 4, 32
    else:
        meta_batch, inner_iters, inner_batch, image = 5, 59, 8, 224
    store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                                 image_size=image, seed=0)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, 0, image, opt_cfg, jit_init=True)
    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=inner_batch,
                          inner_iters=inner_iters,
                          meta_batch_size=meta_batch, foml=True,
                          tail_shots=5, aug_rate=0.5)
    step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg, cfg,
                                           n_max=10), donate_argnums=(0,))
    args = (state, jnp.asarray(store.images), jnp.asarray(store.masks),
            jnp.asarray(store.counts), jax.random.PRNGKey(1),
            jnp.float32(0.1), jnp.float32(5e-4))
    return step, args, dict(meta_batch=meta_batch, inner_iters=inner_iters,
                            inner_batch=inner_batch, image=image)


def fingerprint(jax, config):
    return {"jax": jax.__version__,
            "device_kind": jax.devices()[0].device_kind,
            "n_devices": len(jax.devices()),
            "config": config, "smoke": SMOKE}


def sync(jax, out):
    import numpy as np
    np.asarray(jax.tree_util.tree_leaves(out.params)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=("save", "load"), required=True)
    p.add_argument("--dir", default="/tmp/aot_probe")
    args = p.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    log("probing device...")
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    t_ready = time.time() - t0
    log("device ready")

    os.makedirs(args.dir, exist_ok=True)
    exe_path = os.path.join(args.dir, "chained_step.jaxexe")
    meta_path = exe_path + ".json"
    result = {"phase": args.phase, "device_ready_s": round(t_ready, 1)}

    step, call_args, config = build(jax, jnp)
    fp = fingerprint(jax, config)

    if args.phase == "save":
        t = time.time()
        lowered = step.lower(*call_args)
        result["lower_s"] = round(time.time() - t, 1)
        t = time.time()
        compiled = lowered.compile()
        result["compile_s"] = round(time.time() - t, 1)
        log("compiled in", result["compile_s"], "s (warm persistent cache)")
        t = time.time()
        out = compiled(*call_args)
        sync(jax, out)
        result["first_step_s"] = round(time.time() - t, 1)
        t = time.time()
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
        except Exception as exc:  # noqa: BLE001 - capability probe
            # e.g. the CPU PJRT client: "UNIMPLEMENTED: `LessThan` is not
            # serializable" — record the verdict instead of dying.
            result["serialize_supported"] = False
            result["serialize_error"] = repr(exc)[:300]
            log("serialize unsupported on this backend:", repr(exc)[:120])
        else:
            result["serialize_supported"] = True
            with open(exe_path, "wb") as f:
                pickle.dump({"payload": payload, "in_tree": in_tree,
                             "out_tree": out_tree}, f)
            result["serialize_s"] = round(time.time() - t, 1)
            result["serialized_mb"] = round(
                os.path.getsize(exe_path) / 1e6, 1)
            with open(meta_path, "w") as f:
                json.dump(fp, f)
            log("serialized:", result["serialized_mb"], "MB")
    else:
        with open(meta_path) as f:
            want = json.load(f)
        assert want == fp, "stale executable: {} vs {}".format(want, fp)
        # Rebuild fresh inputs (the donated state was consumed in save).
        t = time.time()
        with open(exe_path, "rb") as f:
            blob = pickle.load(f)
        compiled = se.deserialize_and_load(blob["payload"], blob["in_tree"],
                                           blob["out_tree"])
        result["deserialize_s"] = round(time.time() - t, 1)
        t = time.time()
        out = compiled(*call_args)
        sync(jax, out)
        result["first_step_s"] = round(time.time() - t, 1)
        result["ready_to_first_step_s"] = round(time.time() - t0 - t_ready, 1)
        log("deserialized + stepped")

    result["total_s"] = round(time.time() - t0, 1)
    out_json = os.path.join(args.dir, "probe_{}.json".format(args.phase))
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    log("RESULT", json.dumps(result))


if __name__ == "__main__":
    main()
