"""Checkpoint lifecycle tests: save/restore round-trip, rotation, index-file
latest resolution, scope-filtered restore, best-seen, TF1-name import."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mliis_tpu.meta.inner_loop import (ModelState, OptimizerConfig,
                                       init_model_state)
from mliis_tpu.utils import checkpoint as ckpt
from tests.tiny_model import TinySeg


@pytest.fixture(scope="module")
def state():
    model = TinySeg()
    return init_model_state(model, jax.random.PRNGKey(0), 16,
                            OptimizerConfig(name="adam"))


def _assert_tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path, state):
    path = ckpt.save_checkpoint(str(tmp_path), state, step=5,
                                metadata={"note": "x"})
    assert os.path.exists(path)
    restored, meta = ckpt.restore_checkpoint(str(tmp_path), state)
    _assert_tree_equal(restored.params, state.params)
    _assert_tree_equal(restored.batch_stats, state.batch_stats)
    _assert_tree_equal(restored.opt.v, state.opt.v)
    assert meta["step"] == 5


def test_rotation_max_to_keep(tmp_path, state):
    for step in (1, 2, 3, 4):
        ckpt.save_checkpoint(str(tmp_path), state, step, max_to_keep=2)
    files = [f for f in os.listdir(str(tmp_path)) if f.endswith(".npz")]
    steps = sorted(int(f.split("-")[1].split(".")[0]) for f in files)
    assert steps == [3, 4]


def test_latest_checkpoint_via_index(tmp_path, state):
    ckpt.save_checkpoint(str(tmp_path), state, 7)
    ckpt.save_checkpoint(str(tmp_path), state, 9)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("model.ckpt-9.npz")


def test_scope_filtered_restore(tmp_path, state):
    ckpt.save_checkpoint(str(tmp_path), state, 1)
    # Zero a fresh template; restore only conv0 scope.
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    template = ModelState(zeros, state.batch_stats, state.opt)
    restored, _ = ckpt.restore_checkpoint(str(tmp_path), template,
                                          filter_to_scopes=["conv0"])
    assert np.allclose(np.asarray(restored.params["conv0"]["kernel"]),
                       np.asarray(state.params["conv0"]["kernel"]))
    # final layer stayed zero
    assert np.allclose(
        np.asarray(restored.params["final_layer_weights"]["kernel"]), 0)


def test_filter_out_scope(tmp_path, state):
    ckpt.save_checkpoint(str(tmp_path), state, 1)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    template = ModelState(zeros, state.batch_stats, state.opt)
    restored, _ = ckpt.restore_checkpoint(
        str(tmp_path), template, filter_out_scope="final_layer_weights")
    assert np.allclose(
        np.asarray(restored.params["final_layer_weights"]["kernel"]), 0)
    assert np.allclose(np.asarray(restored.params["conv0"]["kernel"]),
                       np.asarray(state.params["conv0"]["kernel"]))


def test_fine_tuned_checkpoint_layout(tmp_path, state):
    path = ckpt.save_fine_tuned_checkpoint(str(tmp_path / "ft" / "bus"),
                                           state, step=59, eval_sample_num=1)
    assert "/ft/bus/1/" in path.replace(os.sep, "/")


def test_import_tf1_var_map(state):
    new_kernel = np.ones_like(np.asarray(state.params["conv0"]["kernel"]))
    tf_vars = {"model/conv0/kernel": new_kernel, "model/unrelated/w": new_kernel}

    def mapper(name):
        if name == "model/conv0/kernel":
            return "params/conv0/kernel"
        return None

    out = ckpt.import_tf1_var_map(tf_vars, state, mapper)
    assert np.allclose(np.asarray(out.params["conv0"]["kernel"]), 1.0)
    _assert_tree_equal(out.params["final_layer_weights"],
                       state.params["final_layer_weights"])


def test_scope_filter_covers_batch_stats(tmp_path, state):
    """Scope filters apply to BN running stats too: a filtered restore must
    not leak excluded scopes' moving stats from the checkpoint (the
    reference's TF var-scope filter caught moving stats inside the scope,
    efficientlab.py:425-433). BN var initializes to 1, so the zeroed
    template exposes any leak."""
    ckpt.save_checkpoint(str(tmp_path), state, 1)
    zero_bn = jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats)
    template = ModelState(state.params, zero_bn, state.opt)
    restored, _ = ckpt.restore_checkpoint(
        str(tmp_path), template, filter_out_scope="batch_normalization_1")
    bn0 = restored.batch_stats["batch_normalization"]
    bn1 = restored.batch_stats["batch_normalization_1"]
    # In-scope BN stats restored (var back to the checkpoint's 1s)...
    np.testing.assert_array_equal(
        np.asarray(bn0["var"]),
        np.asarray(state.batch_stats["batch_normalization"]["var"]))
    assert float(np.asarray(bn0["var"]).max()) == 1.0
    # ...filtered-out BN stats did NOT leak (template zeros kept).
    assert np.allclose(np.asarray(bn1["var"]), 0)


def test_restore_shape_mismatch_raises(tmp_path, state):
    """A wrong-shaped checkpoint entry raises at restore time in BOTH
    strict and filtered modes (not silently inserted into the pytree)."""
    ckpt.save_checkpoint(str(tmp_path), state, 1)
    import flax
    wide = TinySeg(features=16)
    template = init_model_state(wide, jax.random.PRNGKey(1), 16,
                                OptimizerConfig(name="adam"))
    with pytest.raises(ValueError, match="Shape mismatch"):
        ckpt.restore_checkpoint(str(tmp_path), template)
    with pytest.raises(ValueError, match="Shape mismatch"):
        ckpt.restore_checkpoint(str(tmp_path), template,
                                filter_to_scopes=["conv0"])
