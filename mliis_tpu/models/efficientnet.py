"""EfficientNet feature extractor (flax.linen), b0-b7, with reduction
endpoints and block truncation for segmentation backbones.

A from-scratch functional reimplementation of the architecture the reference
builds in TF1 (models/efficientnet/efficientnet_model.py, efficientnet_builder.py):
MBConv blocks (expand -> depthwise -> SE -> project, id-skip with
drop-connect), width/depth compound scaling with filter rounding, and the
`reduction_i` endpoint bookkeeping EfficientLab consumes
(efficientlab.py:234-246). `max_block_num` truncates graph construction at a
block index (efficientnet_builder.py:90-109 + model truncation): EfficientLab
uses blocks 0..10 of b0 (112-ch reduction_4) or 0..17 of b3 (136-ch).

BatchNorm follows the TPU variant's hyperparameters (momentum 0.99, eps 1e-3)
and takes an optional mesh axis name for cross-replica sync-BN — the
JAX-collective replacement for tpu_ops.cross_replica_sum.
"""
import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mliis_tpu.models import layers


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    id_skip: bool
    strides: Tuple[int, int]
    se_ratio: Optional[float]


# The canonical EfficientNet stage spec ('r1_k3_s11_e1_i32_o16_se0.25', ...).
BASE_BLOCKS: Tuple[BlockArgs, ...] = (
    BlockArgs(3, 1, 32, 16, 1, True, (1, 1), 0.25),
    BlockArgs(3, 2, 16, 24, 6, True, (2, 2), 0.25),
    BlockArgs(5, 2, 24, 40, 6, True, (2, 2), 0.25),
    BlockArgs(3, 3, 40, 80, 6, True, (2, 2), 0.25),
    BlockArgs(5, 3, 80, 112, 6, True, (1, 1), 0.25),
    BlockArgs(5, 4, 112, 192, 6, True, (2, 2), 0.25),
    BlockArgs(3, 1, 192, 320, 6, True, (1, 1), 0.25),
)

# model_name -> (width_coefficient, depth_coefficient, resolution, dropout)
EFFICIENTNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}


def round_filters(filters: int, width_coefficient: float,
                  depth_divisor: int = 8, min_depth: Optional[int] = None) -> int:
    """Width scaling with divisor rounding (efficientnet_model.py:106-122)."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    min_depth = min_depth or depth_divisor
    new_filters = max(min_depth,
                      int(filters + depth_divisor / 2) // depth_divisor
                      * depth_divisor)
    if new_filters < 0.9 * filters:
        new_filters += depth_divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


def decode_truncate(specs: Sequence[BlockArgs],
                    max_block_num: Optional[int]) -> List[BlockArgs]:
    """Stage-level pre-truncation on *unscaled* repeat counts, matching
    BlockDecoder.decode's early stop (efficientnet_builder.py:90-109)."""
    out, num_blocks = [], 0
    for spec in specs:
        num_blocks += spec.num_repeat
        if max_block_num is not None and num_blocks > max_block_num + 1:
            break
        out.append(spec)
    return out


def expand_block_list(model_name: str,
                      max_block_num: Optional[int] = None
                      ) -> Tuple[List[BlockArgs], int]:
    """Per-block (repeat-expanded, scaled) args.

    Returns (blocks_to_build, drop_connect_divisor): the divisor is the
    total block count the reference's Model would hold (its per-block
    drop-connect rate is global_rate * idx / len(blocks)); blocks_to_build is
    truncated to indices 0..max_block_num.
    """
    width, depth, _, _ = EFFICIENTNET_PARAMS[model_name]
    all_blocks: List[BlockArgs] = []
    for spec in decode_truncate(BASE_BLOCKS, max_block_num):
        spec = dataclasses.replace(
            spec,
            input_filters=round_filters(spec.input_filters, width),
            output_filters=round_filters(spec.output_filters, width),
            num_repeat=round_repeats(spec.num_repeat, depth))
        all_blocks.append(spec)
        for _ in range(spec.num_repeat - 1):
            all_blocks.append(dataclasses.replace(
                spec, input_filters=spec.output_filters, strides=(1, 1),
                num_repeat=1))
    divisor = len(all_blocks)
    if max_block_num is not None:
        all_blocks = all_blocks[: max_block_num + 1]
    return all_blocks, divisor


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck with squeeze-and-excitation."""
    args: BlockArgs
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, inputs, train: bool, drop_connect_rate: float = 0.0):
        a = self.args
        filters = a.input_filters * a.expand_ratio
        x = inputs
        if a.expand_ratio != 1:
            x = nn.Conv(filters, (1, 1), use_bias=False,
                        kernel_init=layers.conv_kernel_init,
                        dtype=self.dtype, name="expand_conv")(x)
            x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                                  name="batch_normalization",
                                  dtype=self.dtype)
            x = layers.swish(x)

        x = nn.Conv(filters, (a.kernel_size, a.kernel_size),
                    strides=a.strides, feature_group_count=filters,
                    use_bias=False, kernel_init=layers.depthwise_kernel_init,
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                              name="batch_normalization_1",
                              dtype=self.dtype)
        x = layers.swish(x)

        has_se = a.se_ratio is not None and 0 < a.se_ratio <= 1
        if has_se:
            num_reduced = max(1, int(a.input_filters * a.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(num_reduced, (1, 1), use_bias=True,
                         kernel_init=layers.conv_kernel_init,
                         dtype=self.dtype, name="se_reduce")(se)
            se = layers.swish(se)
            se = nn.Conv(filters, (1, 1), use_bias=True,
                         kernel_init=layers.conv_kernel_init,
                         dtype=self.dtype, name="se_expand")(se)
            x = jax.nn.sigmoid(se) * x

        x = nn.Conv(a.output_filters, (1, 1), use_bias=False,
                    kernel_init=layers.conv_kernel_init,
                    dtype=self.dtype, name="project_conv")(x)
        x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                              name="batch_normalization_2",
                              dtype=self.dtype)

        if (a.id_skip and all(s == 1 for s in a.strides)
                and a.input_filters == a.output_filters):
            if train and drop_connect_rate:
                x = layers.drop_connect(self.make_rng("dropout"), x,
                                        drop_connect_rate)
            x = x + inputs
        return x


class EfficientNetFeatures(nn.Module):
    """Stem + MBConv blocks, returning reduction endpoints 1..5.

    Endpoint `reduction_i` is the last block output at spatial reduction 2^i
    (efficientlab.py:238-246). Blocks after `max_block_num` are not built.
    """
    model_name: str = "efficientnet-b0"
    max_block_num: Optional[int] = None
    drop_connect_rate: float = 0.2
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        width, _, _, _ = EFFICIENTNET_PARAMS[self.model_name]
        blocks, divisor = expand_block_list(self.model_name, self.max_block_num)

        x = nn.Conv(round_filters(32, width), (3, 3), strides=(2, 2),
                    use_bias=False, kernel_init=layers.conv_kernel_init,
                    dtype=self.dtype, name="stem_conv")(x)
        x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                              name="stem_batch_normalization",
                              dtype=self.dtype)
        x = layers.swish(x)

        endpoints = {}
        reduction_idx = 0
        for idx, args in enumerate(blocks):
            is_reduction = (idx == len(blocks) - 1
                            or blocks[idx + 1].strides[0] > 1)
            if is_reduction:
                reduction_idx += 1
            rate = self.drop_connect_rate * idx / divisor if divisor else 0.0
            x = MBConvBlock(args, bn_axis_name=self.bn_axis_name,
                            dtype=self.dtype,
                            name="blocks_{}".format(idx))(
                x, train=train, drop_connect_rate=rate)
            if is_reduction:
                endpoints["reduction_{}".format(reduction_idx)] = x
        return x, endpoints
