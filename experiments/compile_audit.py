"""Compile-census of a bench session: every distinct XLA program it builds.

Through the axon tunnel each remote compile costs seconds even for
one-liner programs (key construction, scalar converts), and the warm-cache
bench session still spent ~60-70 s before its first timed step in round 3.
This audit mirrors bench.py's program sequence (init -> store transfer ->
chained train step -> chained eval chunk; kept in sync by hand, it does not
import bench.py) at toy shapes on CPU with `jax_log_compiles` and reports
each compile event, so the session's program count (not just the big-step
compile) is a measured, minimizable quantity. Usage:

    JAX_PLATFORMS=cpu python experiments/compile_audit.py
"""
import json
import logging
import re
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)


class _CompileLog(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        m = re.search(r"Finished XLA compilation of (\S+) in ([0-9.]+) sec",
                      msg)
        if m:
            self.events.append({"name": m.group(1),
                                "compile_s": float(m.group(2)),
                                "at_s": round(time.time() - T0, 2)})


T0 = time.time()
handler = _CompileLog()
logging.getLogger("jax").addHandler(handler)
logging.getLogger("jax").setLevel(logging.DEBUG)


def checkpoint(label):
    print("[{:6.1f}s] {} (compiles so far: {})".format(
        time.time() - T0, label, len(handler.events)), flush=True)


import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mliis_tpu.data.synthetic import make_synthetic_store  # noqa: E402
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,  # noqa: E402
                                       init_model_state)
from mliis_tpu.meta.learners import (MetaTrainConfig,  # noqa: E402
                                     make_chained_train_step)
from mliis_tpu.meta.evaluate import EvalConfig, GeckoEvaluator  # noqa: E402
from mliis_tpu.models.efficientlab import EfficientLab  # noqa: E402

META_BATCH, INNER_ITERS, INNER_BATCH, IMAGE_SIZE = 2, 3, 4, 32

store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                             image_size=IMAGE_SIZE, seed=0)
model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                     compute_dtype=jnp.bfloat16)
loss_cfg = LossConfig(dice=True, l2=True, remat=False)
opt_cfg = OptimizerConfig(name="sgd")
state = init_model_state(model, jax.random.PRNGKey(0), IMAGE_SIZE, opt_cfg)
checkpoint("init_model_state done")

cfg = MetaTrainConfig(num_shots=10, inner_batch_size=INNER_BATCH,
                      inner_iters=INNER_ITERS, meta_batch_size=META_BATCH,
                      foml=True, tail_shots=2, aug_rate=0.5)
train_step = jax.jit(make_chained_train_step(model, loss_cfg, opt_cfg, cfg,
                                             n_max=10), donate_argnums=(0,))
imgs = jnp.asarray(store.images)
msks = jnp.asarray(store.masks)
cnts = jnp.asarray(store.counts)
checkpoint("store transfer done")

state = train_step(state, imgs, msks, cnts, jax.random.PRNGKey(1),
                   jnp.float32(0.1), jnp.float32(5e-4))
jax.block_until_ready(state.params)
checkpoint("chained train step done")

eval_cfg = EvalConfig(num_shots=5, test_shots=5, inner_batch_size=4,
                      inner_iters=INNER_ITERS, transductive=True,
                      augment=True, task_chunk_size=4, chain_chunk=True)
evaluator = GeckoEvaluator(model, loss_cfg, opt_cfg, eval_cfg, store)
evaluator.evaluate_tasks(state, list(range(4)), jax.random.PRNGKey(7), 5e-4,
                         aug_rate=0.5)
checkpoint("eval chunk done")

main_names = ("train_step", "chunk_fn")
aux = [e for e in handler.events
       if not any(n in e["name"] for n in main_names)]
print(json.dumps({
    "total_compiles": len(handler.events),
    "aux_compiles": len(aux),
    "events": handler.events,
}, indent=1))
