"""TF1 checkpoint-import totality: the name map must cover 100% of the
flagship models' params+batch_stats with zero collisions, including
expand-less MBConv blocks (shifted BN numbering), RSD upsample projections
(shifted conv numbering, efficientlab.py:213-217), and the EMA restore
option (efficientlab.py:407-415)."""
import jax
import numpy as np
import pytest

from mliis_tpu.meta.inner_loop import OptimizerConfig, init_model_state
from mliis_tpu.models import tf1_import
from mliis_tpu.models.efficientlab import EfficientLab


def _state(name, rsd):
    model = EfficientLab(feature_extractor_name=name, rsd=rsd,
                         final_layer_dropout_rate=0.5)
    return init_model_state(model, jax.random.PRNGKey(0), 64,
                            OptimizerConfig(name="sgd"))


def _synthetic_tf_vars(state, backbone_scope):
    """{tf1_name: zeros-of-the-right-shape} derived from the flax tree via
    the inverse grammar (independent encoding of the TF creation-order
    rules)."""
    from flax.traverse_util import flatten_dict
    flat = {"params/" + k: v
            for k, v in flatten_dict(state.params, sep="/").items()}
    flat.update({"batch_stats/" + k: v for k, v in
                 flatten_dict(state.batch_stats, sep="/").items()})
    expected = tf1_import.expected_tf1_names(state.params, state.batch_stats,
                                             backbone_scope)
    tf_vars = {}
    for path, tf_name in expected.items():
        shape = tuple(np.shape(flat[path]))
        if tf_name.endswith("depthwise_kernel"):
            shape = (shape[0], shape[1], shape[3], shape[2])  # back to TF
        tf_vars[tf_name] = np.zeros(shape, np.float32)
    return tf_vars, expected


@pytest.mark.parametrize("scope,rsd", [
    ("efficientnet-b0", (2, 4)),   # EfficientLab-6-3, the run.sh flagship
    ("efficientnet-b3", (2, 4)),   # 136-ch reduction_4 -> upsample projs
    ("efficientnet-b0", (1, 2, 4)),
])
def test_import_map_total(scope, rsd):
    state = _state(scope, rsd)
    tf_vars, expected = _synthetic_tf_vars(state, scope)
    # Every flax leaf has a distinct TF source name (bijection).
    assert len(set(expected.values())) == len(expected)
    target = tf1_import.flat_state_paths(state.params, state.batch_stats)
    converted = tf1_import.convert_tf1_vars(tf_vars, backbone_scope=scope,
                                            target_paths=target)
    tf1_import.assert_complete_import(converted, state.params,
                                      state.batch_stats)


def test_skip_decoding_creates_upsample_projection():
    """With skip_decoding the RSD input is wider than aspp_dim (the concat
    at efficientlab.py:145-149), so the RSD builds the 1x1 projection — the
    case the conv-numbering shift exists for."""
    model = EfficientLab(rsd=(2, 4), skip_decoding=True,
                         final_layer_dropout_rate=0.5)
    state = init_model_state(model, jax.random.PRNGKey(0), 64,
                             OptimizerConfig(name="sgd"))
    paths = tf1_import.flat_state_paths(state.params, state.batch_stats)
    assert any("upsample_proj" in p for p in paths)
    # The projection shifts TF creation-order numbering by one.
    assert tf1_import.map_tf1_name(
        "decode/decode_skip_connections_3/conv2d/kernel",
        target_paths=paths) == \
        "params/decode_skip_connections_3/upsample_proj/conv/kernel"
    assert tf1_import.map_tf1_name(
        "decode/decode_skip_connections_3/conv2d_3/kernel",
        target_paths=paths) == \
        "params/decode_skip_connections_3/fuse/conv/kernel"


def test_expand_less_block_bn_shift():
    """blocks_0 (expand_ratio 1): TF's plain tpu_batch_normalization is the
    DEPTHWISE bn and conv2d is the PROJECT conv."""
    state = _state("efficientnet-b0", (2,))
    target = tf1_import.flat_state_paths(state.params, state.batch_stats)
    assert tf1_import.map_tf1_name(
        "efficientnet-b0/blocks_0/tpu_batch_normalization/gamma",
        target_paths=target) == \
        "params/efficientnet_b0/blocks_0/batch_normalization_1/scale"
    assert tf1_import.map_tf1_name(
        "efficientnet-b0/blocks_0/conv2d/kernel", target_paths=target) == \
        "params/efficientnet_b0/blocks_0/project_conv/kernel"
    # Expanding block keeps creation-order == semantic numbering.
    assert tf1_import.map_tf1_name(
        "efficientnet-b0/blocks_1/tpu_batch_normalization/gamma",
        target_paths=target) == \
        "params/efficientnet_b0/blocks_1/batch_normalization/scale"


def test_ema_variables_override_base():
    tf_vars = {
        "decode/final_layer_weights/kernel":
            np.zeros((1, 1, 112, 2), np.float32),
        "decode/final_layer_weights/kernel/ExponentialMovingAverage":
            np.ones((1, 1, 112, 2), np.float32),
    }
    plain = tf1_import.convert_tf1_vars(tf_vars)
    assert plain["params/final_layer_weights/kernel"].max() == 0.0
    ema = tf1_import.convert_tf1_vars(tf_vars, use_ema=True)
    assert ema["params/final_layer_weights/kernel"].min() == 1.0


def test_import_map_total_without_target_tree():
    """convert_tf1_vars with NO target tree must still map the full b0 var
    set — including blocks_0 (expand_ratio=1), whose expand-less BN
    numbering is inferred from the TF var set itself (a block owns conv2d_1
    iff it has an expand conv). Previously the depthwise BN was dropped and
    the project BN landed on the wrong (wrong-shaped) leaf."""
    state = _state("efficientnet-b0", (2, 4))
    tf_vars, _ = _synthetic_tf_vars(state, "efficientnet-b0")
    converted = tf1_import.convert_tf1_vars(tf_vars,
                                            backbone_scope="efficientnet-b0")
    tf1_import.assert_complete_import(converted, state.params,
                                     state.batch_stats)
    # And the values land on matching shapes (import would raise otherwise).
    from mliis_tpu.utils import checkpoint as ckpt_lib
    ckpt_lib.import_tf1_var_map(converted, state,
                                name_mapper=lambda n: n)
