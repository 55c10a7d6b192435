"""Capture a jax.profiler trace of the 2-task 59-step group program."""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from mliis_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from mliis_tpu.data.synthetic import make_synthetic_store
    from mliis_tpu.meta.inner_loop import LossConfig, OptimizerConfig, \
        init_model_state
    from mliis_tpu.meta.learners import MetaTrainConfig, make_group_train_step
    from mliis_tpu.models.efficientlab import EfficientLab

    store = make_synthetic_store(num_tasks=8, examples_per_task=10,
                                 image_size=224, seed=0)
    model = EfficientLab(rsd=(2, 4), final_layer_dropout_rate=0.5,
                         compute_dtype=jnp.bfloat16)
    loss_cfg = LossConfig(dice=True, l2=True, remat=False)
    opt_cfg = OptimizerConfig(name="sgd")
    state = init_model_state(model, jax.random.PRNGKey(0), 224, opt_cfg)
    cfg = MetaTrainConfig(num_shots=10, inner_batch_size=8, inner_iters=59,
                          meta_batch_size=5, foml=True, tail_shots=5,
                          aug_rate=0.5)
    step = jax.jit(make_group_train_step(model, loss_cfg, opt_cfg, cfg,
                                         n_max=10, group_size=2))
    imgs = jnp.asarray(store.images)
    msks = jnp.asarray(store.masks)
    cnts = jnp.asarray(store.counts)
    args = (imgs, msks, cnts)

    t0 = time.time()
    state = step(state, *args, jax.random.PRNGKey(1), jnp.float32(0.1),
                 jnp.float32(5e-4), jnp.float32(2.0))
    jax.block_until_ready(state.params)
    print("compile+first step:", round(time.time() - t0, 1))

    jax.profiler.start_trace("/tmp/planar_trace")
    for i in range(2):
        state = step(state, *args, jax.random.PRNGKey(2 + i),
                     jnp.float32(0.1), jnp.float32(5e-4), jnp.float32(2.0))
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()
    t0 = time.time()
    for i in range(2):
        state = step(state, *args, jax.random.PRNGKey(5 + i),
                     jnp.float32(0.1), jnp.float32(5e-4), jnp.float32(2.0))
    jax.block_until_ready(state.params)
    print("2 group steps (untraced):", round(time.time() - t0, 3))
    print("trace done")


if __name__ == "__main__":
    main()
