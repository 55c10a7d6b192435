"""Bilinear resize with TF1 align_corners=True semantics.

The reference upsamples with `tf.image.resize_images(..., BILINEAR,
align_corners=True)` (efficientlab.py:136,171,205,277). align_corners maps
source and target corner pixels onto each other (scale = (in-1)/(out-1)),
which differs from jax.image.resize's half-pixel-center convention — and the
difference matters for checkpoint-parity evaluation, so it is implemented
here exactly, as two separable 1-D interpolations expressed as matmuls
(MXU-friendly, fuses cleanly under jit).
"""
import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] sparse-ish bilinear weights, align_corners=True."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if out_size == 1:
        w = np.zeros((1, in_size), np.float32)
        w[0, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1) if in_size > 1 else 0.0
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), np.float32)
    w[np.arange(out_size), lo] += 1.0 - frac
    w[np.arange(out_size), hi] += frac
    return w


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., out_h, out_w, C]."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh = jnp.asarray(_interp_matrix(in_h, out_h))
    ww = jnp.asarray(_interp_matrix(in_w, out_w))
    # Contract H then W: out[..., i, j, c] = sum_hw wh[i,h] ww[j,w] x[...,h,w,c]
    x = jnp.einsum("ih,...hwc->...iwc", wh, x)
    x = jnp.einsum("jw,...iwc->...ijc", ww, x)
    return x
