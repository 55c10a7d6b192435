"""EfficientLab segmentation network (flax.linen).

Functional re-design of the reference's EfficientLab graph
(/root/reference/models/efficientlab.py:21-474): ImageNet input
normalization, EfficientNet-b0/b3 encoder truncated at reduction_4
(112/136 ch), a stack of residual skip-decoder (RSD) modules over the
configured reduction endpoints, optional DeepLab-v3+ skip decoding and
Auto-DeepLab-style ASPP, final-layer dropout (traced rate, so UHO can sweep
it without recompiles), a 1x1 projection to n_classes(+background), and an
align_corners bilinear upsample back to input resolution.

Differences from the reference, by design:
  - pure function of (params, batch_stats, rng, inputs): inner-loop SGD and
    the transductive/non-transductive BN modes become explicit state
    threading instead of graph placeholders;
  - the ASPP image-pooling branch pools over H,W into [N,1,1,C] (the
    reference's expand_dims ordering produced [N,C,1,1] and convolved over
    the channel dim — a latent bug behind a flag run.sh never sets,
    efficientlab.py:271-273);
  - BatchNorm can sync across a mesh axis (see models/layers.py).
"""
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mliis_tpu.models import layers
from mliis_tpu.models.efficientnet import EfficientNetFeatures
from mliis_tpu.ops.resize import resize_bilinear_align_corners

# ImageNet RGB statistics scaled to [0,255] inputs (models/constants.py).
MEAN_RGB = (0.485 * 255, 0.456 * 255, 0.406 * 255)
STDDEV_RGB = (0.229 * 255, 0.224 * 255, 0.225 * 255)

# (aspp feature dimension, encoder truncation block) per backbone
# (efficientlab.py:73-78).
_BACKBONE_CONFIG = {
    "efficientnet-b0": (112, 10),
    "efficientnet-b3": (136, 17),
}


class _ConvNlBn(nn.Module):
    """conv(use_bias) -> swish -> BN, the RSD branch unit
    (efficientlab.py:185-190)."""
    features: int
    kernel_size: int
    dilation: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=True, kernel_init=layers.conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        x = layers.swish(x)
        return layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                                 dtype=self.dtype)


class ResidualSkipDecoder(nn.Module):
    """RSD module: upsample-to-skip, concat, 3-branch mini-ASPP, fuse,
    residual add (efficientlab.py:179-231)."""
    num_output_filters: int
    residual: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, embedded, skip, train: bool):
        upsampled = resize_bilinear_align_corners(
            embedded, skip.shape[-3], skip.shape[-2])
        decoded = jnp.concatenate([upsampled, skip], axis=-1)

        if upsampled.shape[-1] != self.num_output_filters:
            upsampled = _ConvNlBn(self.num_output_filters, 1,
                                  bn_axis_name=self.bn_axis_name,
                                  dtype=self.dtype,
                                  name="upsample_proj")(upsampled, train)
        num_decoded_filters = upsampled.shape[-1]

        branch_0 = _ConvNlBn(num_decoded_filters, 1,
                             bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype,
                             name="branch_0")(decoded, train)
        branch_1 = _ConvNlBn(num_decoded_filters, 3, dilation=2,
                             bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype,
                             name="branch_1")(decoded, train)
        pooled = jnp.mean(decoded, axis=(1, 2), keepdims=True)
        branch_2 = jnp.broadcast_to(pooled, decoded.shape)

        pyramid = jnp.concatenate([branch_0, branch_1, branch_2], axis=-1)
        decoded = _ConvNlBn(self.num_output_filters, 3,
                            bn_axis_name=self.bn_axis_name,
                            dtype=self.dtype,
                            name="fuse")(pyramid, train)
        if self.residual:
            decoded = decoded + upsampled
        return decoded


class _SepConv(nn.Module):
    """Depthwise-separable conv with always-training BN, used by the DeepLab
    skip decoder (efficientlab.py:445-474 — note the reference hardcodes
    training=True for these BNs; preserved here)."""
    features: int
    kernel_size: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        del train  # reference passes literal training=True
        in_features = x.shape[-1]
        x = nn.Conv(in_features, (self.kernel_size, self.kernel_size),
                    feature_group_count=in_features, use_bias=False,
                    kernel_init=layers.depthwise_kernel_init,
                    name="depthwise_conv")(x)
        x = layers.batch_norm(x, True, axis_name=self.bn_axis_name,
                              name="batch_normalization")
        x = layers.swish(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=layers.conv_kernel_init, name="pointwise_conv")(x)
        x = layers.batch_norm(x, True, axis_name=self.bn_axis_name,
                              name="batch_normalization_1")
        return layers.swish(x)


class Aspp(nn.Module):
    """Auto-DeepLab-style ASPP with dropout in place of BN
    (efficientlab.py:248-289)."""
    features: int
    dropout_rate: float = 0.5
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        def drop(v):
            if train and self.dropout_rate > 0:
                v = layers.traced_dropout(self.make_rng("dropout"), v,
                                          self.dropout_rate, deterministic=False)
            return v

        b0 = nn.Conv(self.features, (1, 1), use_bias=True,
                     kernel_init=layers.conv_kernel_init, name="branch_0")(x)
        b0 = drop(layers.swish(b0))

        b1 = nn.Conv(self.features, (3, 3), kernel_dilation=(6, 6),
                     use_bias=True, kernel_init=layers.conv_kernel_init,
                     name="branch_1")(x)
        b1 = drop(layers.swish(b1))

        b2 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b2 = nn.Conv(self.features, (1, 1), use_bias=True,
                     kernel_init=layers.conv_kernel_init, name="branch_2")(b2)
        b2 = layers.swish(drop(b2))
        b2 = jnp.broadcast_to(b2, x.shape[:-1] + (self.features,))

        out = jnp.concatenate([b2, b1, b0], axis=-1)
        out = nn.Conv(self.features, (1, 1), use_bias=True,
                      kernel_init=layers.conv_kernel_init, name="fuse")(out)
        out = drop(layers.swish(out))
        return out


class EfficientLab(nn.Module):
    """The full segmentation network.

    __call__ returns (logits, probabilities) at input resolution; prediction
    thresholding (probs > 0.5) and losses live in ops/, keeping the module a
    pure feature->distribution map.
    """
    n_classes: int = 1
    separate_background_channel: bool = True
    feature_extractor_name: str = "efficientnet-b0"
    rsd: Optional[Sequence[int]] = (2,)
    spatial_pyramid_pooling: bool = False
    skip_decoding: bool = False
    disable_rsd_residual_connections: bool = False
    final_layer_dropout_rate: Optional[float] = 0.2
    bn_axis_name: Optional[str] = None
    # Compute dtype for conv/BN work (params and logits stay float32);
    # jnp.bfloat16 engages the MXU fast path on TPU.
    compute_dtype: Optional[jnp.dtype] = None

    @property
    def n_output_channels(self) -> int:
        return self.n_classes + 1 if self.separate_background_channel \
            else self.n_classes

    @nn.compact
    def __call__(self, images, train: bool = True,
                 final_layer_dropout_rate=None):
        """images: [N, H, W, 3] float32 in [0, 255]."""
        aspp_dim, max_block_num = _BACKBONE_CONFIG[self.feature_extractor_name]
        in_h, in_w = images.shape[-3], images.shape[-2]

        x = images - jnp.asarray(MEAN_RGB, images.dtype)
        x = x / jnp.asarray(STDDEV_RGB, images.dtype)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        _, endpoints = EfficientNetFeatures(
            model_name=self.feature_extractor_name,
            max_block_num=max_block_num,
            bn_axis_name=self.bn_axis_name,
            dtype=self.compute_dtype,
            name=self.feature_extractor_name.replace("-", "_"))(x, train=train)
        skips = [endpoints["reduction_1"], endpoints["reduction_2"],
                 endpoints["reduction_3"], endpoints["reduction_4"]]
        embedded = endpoints["reduction_4"]

        decoded = embedded
        if self.spatial_pyramid_pooling:
            decoded = Aspp(aspp_dim, bn_axis_name=self.bn_axis_name,
                           name="spatial_pyramid_pooling")(decoded, train)

        if self.skip_decoding:
            skip = skips[1]
            decoded = resize_bilinear_align_corners(
                decoded, in_h // 4, in_w // 4)
            decoded_skip_dim = aspp_dim // 2
            dskip = nn.Conv(decoded_skip_dim, (1, 1), use_bias=False,
                            kernel_init=layers.conv_kernel_init,
                            name="decode_skip_proj")(skip)
            dskip = layers.batch_norm(dskip, True,
                                      axis_name=self.bn_axis_name,
                                      name="decode_skip_batch_normalization")
            dskip = layers.swish(dskip)
            decoded = jnp.concatenate([decoded, dskip], axis=-1)
            decoded = _SepConv(aspp_dim + decoded_skip_dim, 3,
                               bn_axis_name=self.bn_axis_name,
                               name="sep_conv_0")(decoded, train)
            decoded = _SepConv(aspp_dim + decoded_skip_dim, 3,
                               bn_axis_name=self.bn_axis_name,
                               name="sep_conv_1")(decoded, train)

        if self.rsd:
            for i in sorted(self.rsd, reverse=True):
                reduction_index = i - 1
                decoded = ResidualSkipDecoder(
                    num_output_filters=aspp_dim,
                    residual=not self.disable_rsd_residual_connections,
                    bn_axis_name=self.bn_axis_name,
                    dtype=self.compute_dtype,
                    name="decode_skip_connections_{}".format(reduction_index)
                )(decoded, skips[reduction_index], train)

        drop_rate = final_layer_dropout_rate
        if drop_rate is None:
            drop_rate = self.final_layer_dropout_rate
        if isinstance(drop_rate, (int, float)) and drop_rate <= 0:
            drop_rate = None  # rate 0 builds no dropout (efficientlab.py:95-100)
        if drop_rate is not None and train:
            decoded = layers.traced_dropout(self.make_rng("dropout"), decoded,
                                            drop_rate, deterministic=False)

        decoded = nn.Conv(self.n_output_channels, (1, 1), use_bias=True,
                          kernel_init=layers.conv_kernel_init,
                          dtype=self.compute_dtype,
                          name="final_layer_weights")(decoded)
        decoded = decoded.astype(jnp.float32)
        logits = resize_bilinear_align_corners(decoded, in_h, in_w)
        probabilities = jax.nn.softmax(logits, axis=-1)
        return logits, probabilities


def predictions_from_probabilities(probabilities, thresh: float = 0.5):
    """Hard class map: cast(probs > thresh) (efficientlab.py:291-292)."""
    return (probabilities > thresh).astype(jnp.float32)
