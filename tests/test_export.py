"""Serving-export tests: the StableHLO artifact reproduces the in-process
forward and round-trips through serialize/deserialize without the model
code (utils/export.py; reference deployment surface: per-task fine-tuned
checkpoints, utils/util.py:72-81)."""
import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
from mliis_tpu.utils import export as export_lib
from tests.tiny_model import TinySeg

IMG = 16


def test_serving_artifact_roundtrip(tmp_path):
    model = TinySeg()
    state = init_model_state(model, jax.random.PRNGKey(0), IMG,
                             OptimizerConfig(name="sgd"))
    images = jax.random.uniform(jax.random.PRNGKey(1), (3, IMG, IMG, 3),
                                jnp.float32, 0, 255)
    _, ref = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats}, images,
                         train=False)

    path = str(tmp_path / "tinyseg.stablehlo")
    export_lib.save_serving_artifact(path, model, state, IMG, batch_size=3,
                                     platforms=("cpu",))
    loaded = export_lib.load_serving_artifact(path)
    out = loaded.call(images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_serving_artifact_polymorphic_batch(tmp_path):
    """batch_size=None exports a symbolic batch dim: one artifact serves
    any batch size."""
    model = TinySeg()
    state = init_model_state(model, jax.random.PRNGKey(0), IMG,
                             OptimizerConfig(name="sgd"))
    data, exported = export_lib.export_serving_fn(model, state, IMG,
                                                  batch_size=None,
                                                  platforms=("cpu",))
    assert len(data) > 0
    for n in (1, 5):
        images = jax.random.uniform(jax.random.PRNGKey(n), (n, IMG, IMG, 3),
                                    jnp.float32, 0, 255)
        _, ref = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats}, images,
                             train=False)
        out = exported.call(images)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
