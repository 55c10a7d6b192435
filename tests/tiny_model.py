"""A tiny segmentation model with the EfficientLab call signature, for fast
engine tests (the real model's CPU compile dominates test time otherwise)."""
import jax
import jax.numpy as jnp
from flax import linen as nn

from mliis_tpu.models import layers


class TinySeg(nn.Module):
    n_output_channels: int = 2
    features: int = 8
    final_layer_dropout_rate: float = 0.0
    bn_axis_name: str = None  # sync-BN mesh axis, like EfficientLab's

    @nn.compact
    def __call__(self, images, train: bool = True,
                 final_layer_dropout_rate=None):
        x = images / 255.0
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), use_bias=False,
                    kernel_init=layers.conv_kernel_init, name="conv0")(x)
        x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                              name="batch_normalization")
        x = layers.swish(x)
        x = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=layers.conv_kernel_init, name="conv1")(x)
        x = layers.batch_norm(x, train, axis_name=self.bn_axis_name,
                              name="batch_normalization_1")
        x = layers.swish(x)
        rate = final_layer_dropout_rate
        if rate is None:
            rate = self.final_layer_dropout_rate
        if isinstance(rate, (int, float)) and rate <= 0:
            rate = None
        if rate is not None and train:
            x = layers.traced_dropout(self.make_rng("dropout"), x, rate,
                                      deterministic=False)
        x = nn.Conv(self.n_output_channels, (1, 1), use_bias=True,
                    name="final_layer_weights")(x)
        from mliis_tpu.ops.resize import resize_bilinear_align_corners
        logits = resize_bilinear_align_corners(
            x, images.shape[-3], images.shape[-2])
        return logits, jax.nn.softmax(logits, axis=-1)
