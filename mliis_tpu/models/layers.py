"""Shared model layers: initializers, batch norm, drop-connect, dropout.

Design notes (vs. the reference):
  - conv kernels use Normal(0, sqrt(2/fan_out)) exactly like
    `conv_kernel_initializer` (efficientnet_model.py:61-82);
  - batch norm replaces `TpuBatchNormalization`'s manual
    `tpu_ops.cross_replica_sum` (models/efficientnet/utils.py:87-134) with
    flax's `axis_name`-based cross-replica moments — when a mesh axis name is
    supplied the moments are pmean'd over it by XLA collectives (sync-BN over
    ICI); with no axis it computes local moments, which is also what the
    reference does in every documented (single-shard) run;
  - drop_connect matches utils.py:137-152 (per-sample Bernoulli on the
    residual branch, scaled by 1/keep_prob);
  - `traced_dropout` supports a *traced* rate so the final-layer drop rate
    can be swept by UHO without recompilation (the reference feeds
    `final_layer_dropout_rate_ph`).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """Normal with stddev sqrt(2 / fan_out); flax kernel shape [kh,kw,in,out]."""
    kh, kw, _, out = shape
    fan_out = int(kh * kw * out)
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)


def depthwise_kernel_init(key, shape, dtype=jnp.float32):
    """TF DepthwiseConv2D initializes with fan_out = kh*kw*channel_multiplier
    (the kernel's last dim), i.e. treats the depth multiplier as fan-out."""
    kh, kw, _, out = shape
    fan_out = int(kh * kw * 1)
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)


swish = jax.nn.silu


# Fused scale-bias BatchNorm (the default): moments accumulate in f32 from
# the bf16 activations (one convert+reduce pass), then the normalization
# folds gamma/beta/mean/var into per-channel (mul, add) f32 scalars applied
# as a SINGLE multiply-add in the compute dtype — instead of flax
# nn.BatchNorm's subtract/rsqrt/multiply/add chain with every operand cast
# to bf16 first. Same parameter/stat tree ({scale, bias} / {mean, var}
# under the module name), same reference hyperparams
# (/root/reference/models/efficientnet/utils.py:87-134). Set False to fall
# back to flax nn.BatchNorm (perf A/B).
USE_FUSED_BN = True


class FusedBatchNorm(nn.Module):
    """Scale-bias-folded BatchNorm; cross-replica moments over `axis_name`
    (the TpuBatchNormalization cross_replica_sum equivalent)."""
    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (features,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (features,),
                               jnp.float32)

        # Initialization uses the running stats so a sync-BN model
        # (axis_name set) can init outside its mesh without binding the
        # collective axis. Deliberate deviation from flax nn.BatchNorm,
        # which computes batch statistics during init (with the collective
        # suppressed); benign here because init only fixes shapes and the
        # fresh running stats are (0, 1).
        if use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale      # f32 [C]
        add = bias - mean * inv                              # f32 [C]
        out_dtype = self.dtype if self.dtype is not None else x.dtype
        return x.astype(out_dtype) * inv.astype(out_dtype) \
            + add.astype(out_dtype)


def batch_norm(x, train, momentum: float = 0.99, epsilon: float = 1e-3,
               axis_name: Optional[str] = None,
               name: str = "batch_normalization", dtype=None):
    """Inline BN for use inside nn.compact modules. `dtype` is the compute
    dtype (bf16 for the MXU fast path); params/stats stay float32."""
    if USE_FUSED_BN:
        return FusedBatchNorm(momentum=momentum, epsilon=epsilon,
                              axis_name=axis_name, dtype=dtype, name=name)(
                                  x, use_running_average=not train)
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=epsilon, axis_name=axis_name, name=name,
                        dtype=dtype)(x)


def drop_connect(key, x, drop_rate):
    """Stochastic depth on the residual branch; batch dim first."""
    keep_prob = 1.0 - drop_rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + jax.random.uniform(key, shape, x.dtype)
    binary = jnp.floor(random_tensor)
    return (x / keep_prob) * binary


def traced_dropout(key, x, rate, deterministic: bool):
    """Inverted dropout with a possibly-traced rate."""
    if deterministic:
        return x
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)
