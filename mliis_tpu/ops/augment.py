"""On-device image+mask augmentation kernels for episodic training.

TPU-native replacement for the reference's host-numpy augmentation engine
(/root/reference/augmenters/np_augmenters.py). Every augmentation is a pure
jnp function of (PRNG key, image, mask), shape-preserving and jit/vmap-safe,
so per-sample augmentation fuses into the same XLA program as batch assembly
and the inner-loop SGD steps — no host round-trips.

Layout: the composition runs CHANNEL-PLANAR — image and mask stacked into
one [C_img+C_msk, H, W] tensor with W as the minor (lane) axis for every
operation (rolls and flips act on the last two dims; both FFT-shear axes are
routed through the last axis with one explicit transpose pair). One layout
across all six augmentation branches means XLA assigns a single layout to
the augmented batch instead of re-laying it out around every stage — the
per-scan-iteration copy storm measured at 25% of device time in round 2
(docs/PERF_NOTES.md lever 1). The channel-last (key, image, mask) API is
preserved as thin wrappers that stack/unstack at the composition boundary.

Semantics match the reference's numpy functions:
  - images are float32 in [0, 255], masks are [H, W, C] one-hot with
    background in channel 0; the "background fill" for masks is [1, 0, ...];
  - `random_eraser` paints a random rectangle with one uniform value and sets
    the mask there to background (np_augmenters.py:21-36);
  - `translate` jitters by 1..23 px along one axis, either rolling or filling
    the vacated stripe (image: uniform-random per-channel fill; mask:
    background). NOTE: the reference's shift helpers roll one axis but fill
    the *other* (np_augmenters.py:45-82, a latent bug); we implement the
    intended single-axis semantics;
  - `rotate_img_mask` rotates by -45..44 degrees with a border mode drawn
    from {reflect, constant, mirror, wrap}; order-1 resampling for the image
    (the reference uses scipy's order-3 splines; bilinear is the TPU-friendly
    equivalent), order-0 for the mask; constant mode optionally noise-fills
    the image border (np_augmenters.py:100-129);
  - `apply_augmentations` keeps the original with probability
    `prob_to_return_original` (default 1/(n_funcs+1), matching
    Augmenter.__init__), otherwise applies a uniformly-random prefix of a
    uniformly-random permutation of the function list
    (np_augmenters.py:144-156).
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jnp.ndarray, jnp.ndarray]

NUM_AUG_FUNCS = 6
_ROTATE_MODES = ("reflect", "constant", "mirror", "wrap")


def _to_planar(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Stack channel-last (image, mask) into one planar [C_img+C_msk, H, W]."""
    return jnp.concatenate([jnp.moveaxis(image, -1, 0),
                            jnp.moveaxis(mask, -1, 0)], axis=0)


def _from_planar(x: jnp.ndarray, c_img: int) -> Pair:
    return jnp.moveaxis(x[:c_img], 0, -1), jnp.moveaxis(x[c_img:], 0, -1)


def _bg_fill_vec(c_img: int, c_tot: int, dtype=jnp.float32) -> jnp.ndarray:
    """[C_msk] one-hot background vector [1, 0, ...] for the mask planes."""
    return jnp.zeros((c_tot - c_img,), dtype).at[0].set(1.0)


# --------------------------------------------------------------------------
# Planar augmentation cores: f(key, x, c_img) -> x with x: [C, H, W].
# Random-draw order matches the original channel-last implementations so a
# given key produces the same decisions (gates, shifts, angles, modes).
# --------------------------------------------------------------------------


def _noise_planar(key, x, c_img, mean_sd: float = 5.1):
    k1, k2 = jax.random.split(key)
    sd = jnp.abs(mean_sd + jax.random.normal(k1, ()))
    noise = sd * jax.random.normal(k2, (c_img,) + x.shape[1:])
    img = jnp.clip(x[:c_img] + noise, 0.0, 255.0)
    return jnp.concatenate([img, x[c_img:]], axis=0)


def _exposure_planar(key, x, c_img, mean_sd: float = 12.75):
    k1, k2 = jax.random.split(key)
    sd = jnp.abs(mean_sd + jax.random.normal(k1, ()))
    shift = sd * jax.random.normal(k2, ())
    img = jnp.clip(x[:c_img] + shift, 0.0, 255.0)
    return jnp.concatenate([img, x[c_img:]], axis=0)


def _eraser_planar(key, x, c_img, s_l: float = 0.02, s_h: float = 0.10,
                   r_1: float = 0.3, r_2: float = 1.0 / 0.3,
                   v_l: float = 0.0, v_h: float = 255.0):
    c_tot, img_h, img_w = x.shape
    ks = jax.random.split(key, 5)
    s = jax.random.uniform(ks[0], (), minval=s_l, maxval=s_h) * img_h * img_w
    r = jax.random.uniform(ks[1], (), minval=r_1, maxval=r_2)
    w = jnp.floor(jnp.sqrt(s / r)).astype(jnp.int32)
    h = jnp.floor(jnp.sqrt(s * r)).astype(jnp.int32)
    top = jax.random.randint(ks[2], (), 0, img_h)
    left = jax.random.randint(ks[3], (), 0, img_w)
    c = jax.random.uniform(ks[4], (), minval=v_l, maxval=v_h)

    rows = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 1)
    region = ((rows >= top) & (rows < top + h)
              & (cols >= left) & (cols < left + w))
    fill = jnp.concatenate([jnp.full((c_img,), c, x.dtype),
                            _bg_fill_vec(c_img, c_tot, x.dtype)])
    return jnp.where(region[None], fill[:, None, None], x)


def _fliplr_planar(key, x, c_img):
    del key, c_img
    return x[..., ::-1]


def _roll_planar(x, shift, axis):
    """Circular roll of planar [C, H, W] by a traced shift along spatial
    `axis` (0 = H, 1 = W).

    Under vmap a dynamic-slice/jnp.roll with per-sample starts lowers to a
    gather, which is pathologically slow on TPU (measured ~5 s for 472
    images). A roll is a permutation, so it is expressed as a matmul with a
    permutation matrix built from iota comparisons — pure MXU work
    (~30 GFLOP for a 472-image batch, sub-millisecond). Each output element
    equals exactly one input element, so the f32 matmul is exact.
    """
    n = x.shape[axis + 1]
    shift = jnp.mod(shift, n)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # out[i] = in[i - shift mod n]  ->  P[i, j] = (j == i - shift)
    perm = (jnp.mod(i - shift, n) == j).astype(x.dtype)
    if axis == 0:
        return jnp.einsum("ij,cjw->ciw", perm, x,
                          preferred_element_type=x.dtype)
    return jnp.einsum("chj,ij->chi", x, perm,
                      preferred_element_type=x.dtype)


def _shift_planar(x, axis, shift, roll, fill_vec):
    """Roll planar x by `shift` (traced, may be negative) along spatial
    `axis`; when not rolling, overwrite the wrapped-in stripe with the
    per-channel `fill_vec` [C]."""
    rolled = _roll_planar(x, shift, axis)
    h, w = x.shape[1], x.shape[2]
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
    size = x.shape[axis + 1]
    # shift > 0: stripe is [0, shift); shift < 0: stripe is [size+shift, size).
    stripe = jnp.where(shift >= 0, idx < shift, idx >= size + shift)
    filled = jnp.where(stripe[None], fill_vec[:, None, None], rolled)
    return jnp.where(roll, rolled, filled)


def _translate_planar(key, x, c_img, max_shift: int = 23):
    c_tot = x.shape[0]
    ks = jax.random.split(key, 5)
    vert = jax.random.bernoulli(ks[0])
    direction = jax.random.bernoulli(ks[1])
    shift = jax.random.randint(ks[2], (), 1, max_shift + 1)
    shift = jnp.where(direction, shift, -shift)
    roll = jax.random.bernoulli(ks[3])

    img_fill = jax.random.uniform(ks[4], (c_img,), minval=0.0, maxval=255.0)
    fill_vec = jnp.concatenate([img_fill, _bg_fill_vec(c_img, c_tot)])

    x0 = _shift_planar(x, 0, shift, roll, fill_vec)
    x1 = _shift_planar(x, 1, shift, roll, fill_vec)
    return jnp.where(vert, x0, x1)


def _rotation_coords(hw, angle_deg):
    """Input-space sampling coordinates for a rotation about the center."""
    h, w = hw
    theta = -angle_deg * jnp.pi / 180.0  # inverse mapping
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * ys - sin * xs + cy
    src_x = sin * ys + cos * xs + cx
    return src_y, src_x


def _fold_coords(c: jnp.ndarray, n: int, mode_idx: jnp.ndarray) -> jnp.ndarray:
    """Fold float sampling coordinates into [0, n-1] per border mode
    (scipy conventions): 0=reflect (edge-duplicating), 1=constant (no fold),
    2=mirror (edge-sharing), 3=wrap. All arithmetic, no gathers."""
    reflect = jnp.mod(c, 2.0 * n)
    reflect = jnp.where(reflect > n - 1, 2.0 * n - 1.0 - reflect, reflect)
    mirror = jnp.mod(c, 2.0 * n - 2.0)
    mirror = jnp.where(mirror > n - 1, 2.0 * n - 2.0 - mirror, mirror)
    wrap = jnp.mod(c, 1.0 * n)
    folded = jnp.where(mode_idx == 0, reflect,
                       jnp.where(mode_idx == 2, mirror,
                                 jnp.where(mode_idx == 3, wrap, c)))
    return folded


# Toggle for the gather-free shear rotation (see _rotate_shear_planar).
FAST_ROTATE = True

# Spectral shear backend: explicit DFT matmuls (True) or jnp.fft (False).
# XLA:TPU lowers jnp.fft via a Cooley-Tukey factorization whose 6-D stage
# tensors ([..., 224] -> [..., 32, 7]) are copied between layouts around
# every stage — measured as the largest remaining copy class in the
# optimized HLO (docs/PERF_NOTES.md). The DFT-matmul form is four real
# [..., n] @ [n, n] matmuls per shear (pure MXU work, one layout, the
# matrices hoisted as constants) and is mathematically identical up to f32
# rounding.
SHEAR_VIA_DFT_MATMUL = True


def _dft_matrices(n: int):
    """Real/imag parts of the symmetric DFT matrix M[j,k] = e^{-2πi jk/n}."""
    j = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
    ang = (2.0 * jnp.pi / n) * j * k
    return jnp.cos(ang), -jnp.sin(ang)


def _shear_last_axis(x, shifts):
    """Inverse-sampling circular shear along the LAST axis:
    out[..., q, p] = in(..., q, p - shifts[q]), as a spectral phase shift —
    exact fractional translation per lane with no gathers or per-shift
    copies (a static-roll-sum formulation materialized 350+ full-size
    temps; a gather formulation ran ~3 ms per image). Always transforming
    the minor (lane) axis keeps every transform in one layout; the
    row-shear direction routes through an explicit swapaxes pair instead of
    a second transform layout (docs/PERF_NOTES.md lever 1)."""
    n = x.shape[-1]
    kvec = jnp.fft.fftfreq(n) * n
    s = shifts.reshape((1,) * (x.ndim - 2) + (shifts.shape[0], 1))
    theta = (-2.0 * jnp.pi / n) * kvec.reshape((1,) * (x.ndim - 1) + (n,)) * s
    if not SHEAR_VIA_DFT_MATMUL:
        spectrum = jnp.fft.fft(x, axis=-1)
        phase = jnp.cos(theta) + 1j * jnp.sin(theta)
        return jnp.fft.ifft(spectrum * phase, axis=-1).real.astype(x.dtype)
    fr, fi = _dft_matrices(n)
    xr = jnp.matmul(x, fr, preferred_element_type=jnp.float32)
    xi = jnp.matmul(x, fi, preferred_element_type=jnp.float32)
    pr = jnp.cos(theta)
    pi = jnp.sin(theta)
    yr = xr * pr - xi * pi
    yi = xr * pi + xi * pr
    # real(ifft): (yr @ Fr + yi @ Fi) / n   (M symmetric, W = conj(M)/n).
    out = (jnp.matmul(yr, fr, preferred_element_type=jnp.float32)
           + jnp.matmul(yi, fi, preferred_element_type=jnp.float32)) / n
    return out.astype(x.dtype)


def _rotate_shear_planar(x, c_img, angle, mode_idx, fill_with_noise,
                         const_cval, noise):
    """Gather-free rotation of planar [C, H, W]: the Paeth 3-shear
    decomposition R(a) = Sx(-tan(a/2)) Sy(sin a) Sx(-tan(a/2)), each shear
    an FFT phase shift along the lane axis (the column shear transposes the
    spatial dims around the transform). Valid for |angle| <= 45 (the
    reference's range). Border semantics: constant mode is exact
    (out-of-bounds pixels from the true rotation coords get cval/noise and
    the mask gets background); the reflect/mirror/wrap modes all present
    wrap-style borders here (the shears roll circularly) — a documented
    deviation confined to the out-of-frame border bands of a random
    augmentation. Masks ride through the bilinear shears and are snapped
    back to one-hot (vs. the reference's order-0 resampling: boundary pixels
    may differ). `noise` is planar [c_img, H, W]."""
    c_tot, h, w = x.shape
    theta = -angle * jnp.pi / 180.0  # match _apply_rotation's convention
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    rows = (jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0) - cy)[:, 0]
    cols = (jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0) - cx)[:, 0]

    x = _shear_last_axis(x, alpha * rows)
    x = jnp.swapaxes(_shear_last_axis(jnp.swapaxes(x, -1, -2), beta * cols),
                     -1, -2)
    x = _shear_last_axis(x, alpha * rows)

    # Snap the mask planes back to one-hot (2-channel argmax).
    if c_tot - c_img == 2:
        fg = (x[c_img + 1] >= x[c_img]).astype(x.dtype)
        x = jnp.concatenate([x[:c_img], (1.0 - fg)[None], fg[None]], axis=0)

    # Out-of-bounds region from the exact rotation coordinates.
    src_y, src_x = _rotation_coords((h, w), angle)
    oob = ((src_y < -0.5) | (src_y > h - 0.5)
           | (src_x < -0.5) | (src_x > w - 0.5))
    is_constant = mode_idx == 1
    cval_img = jnp.where(fill_with_noise, noise,
                         jnp.broadcast_to(const_cval, (c_img, h, w)))
    fill = jnp.concatenate(
        [cval_img, jnp.broadcast_to(
            _bg_fill_vec(c_img, c_tot, x.dtype)[:, None, None],
            (c_tot - c_img, h, w))], axis=0)
    return jnp.where((is_constant & oob)[None], fill, x)


def _rotate_4tap_planar(x, c_img, angle, mode_idx, fill_with_noise,
                        const_cval, noise):
    """Deterministic 4-tap bilinear rotation of planar [C, H, W]
    (mode_idx indexes _ROTATE_MODES; `noise` is planar [c_img, H, W]).

    A single fused bilinear sampler over the stacked image+mask channels
    with arithmetic coordinate folding per mode — ONE shared index
    computation and 4 gathers total. (A naive per-mode map_coordinates
    construction materializes ~24 full-size index tensors; at the
    precomputed-augmentation batch widths this alone cost tens of GB of XLA
    temps and was the eval-path OOM.)

    Image channels are sampled bilinearly (order-1 stand-in for scipy's
    order-3), mask channels with nearest-neighbor (order 0). Constant mode
    fills out-of-bounds image pixels with a random constant or per-pixel
    noise and the mask with background (np_augmenters.py:100-129).
    """
    c_tot, h, w = x.shape
    src_y, src_x = _rotation_coords((h, w), angle)
    is_constant = mode_idx == 1
    fy = _fold_coords(src_y, h, mode_idx)
    fx = _fold_coords(src_x, w, mode_idx)

    y0f = jnp.floor(fy)
    x0f = jnp.floor(fx)
    wy = fy - y0f
    wx = fx - x0f
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    # Per-tap in-bounds weights (only < 1 in constant mode, where coords are
    # unfolded): OOB taps contribute cval mass instead.
    def in_b(yt, xt):
        ok = (yt >= -1e-6) & (yt <= h - 1 + 1e-6) & \
             (xt >= -1e-6) & (xt <= w - 1 + 1e-6)
        return jnp.where(is_constant, ok.astype(jnp.float32), 1.0)

    taps = [
        ((1 - wy) * (1 - wx) * in_b(y0f, x0f), y0, x0),
        ((1 - wy) * wx * in_b(y0f, x0f + 1), y0, x1),
        (wy * (1 - wx) * in_b(y0f + 1, x0f), y1, x0),
        (wy * wx * in_b(y0f + 1, x0f + 1), y1, x1),
    ]

    flat = x.reshape(c_tot, h * w)

    sampled = 0.0
    weight_mass = 0.0
    tap_values = []
    for tap_w, yt, xt in taps:
        vals = jnp.take(flat, (yt * w + xt).reshape(-1), axis=1).reshape(
            c_tot, h, w)
        tap_values.append(vals)
        sampled = sampled + tap_w[None] * vals
        weight_mass = weight_mass + tap_w

    # Image: bilinear blend; in constant mode missing mass blends toward the
    # fill value (random constant, or a -256 sentinel for noise mode whose
    # fully-out pixels become per-pixel noise — reference semantics).
    img_sampled = sampled[:c_img]
    cval_eff = jnp.where(fill_with_noise, -256.0, const_cval)
    img = img_sampled + (1.0 - weight_mass)[None] * cval_eff
    fully_out = (weight_mass <= 1e-6)[None]
    img = jnp.where(fully_out & fill_with_noise, noise, img)
    img = jnp.where(is_constant, img, img_sampled)

    # Mask: nearest tap (order 0) — pick the tap with the largest weight.
    near = (wy >= 0.5).astype(jnp.int32) * 2 + (wx >= 0.5).astype(jnp.int32)
    msk = tap_values[0][c_img:]
    for t in range(1, 4):
        msk = jnp.where((near == t)[None], tap_values[t][c_img:], msk)
    # Constant mode: the nearest sample point out of bounds -> background.
    near_y = jnp.round(src_y)
    near_x = jnp.round(src_x)
    oob = ((near_y < 0) | (near_y > h - 1) | (near_x < 0)
           | (near_x > w - 1))
    bg = jnp.broadcast_to(_bg_fill_vec(c_img, c_tot, x.dtype)[:, None, None],
                          (c_tot - c_img, h, w))
    msk = jnp.where((is_constant & oob)[None], bg, msk)
    return jnp.concatenate([img, msk], axis=0)


def _rotate_planar(key, x, c_img, max_angle: int = 45):
    """Rotation with a random border mode (planar core)."""
    # Border noise from its own split child: JAX does not guarantee
    # independence between draws from a key and its split children (and
    # fold_in(k, d) == split(k, n)[d] under threefry), so the parent key
    # must not be drawn from after splitting.
    ks = jax.random.split(key, 5)
    angle = jax.random.randint(ks[0], (), -max_angle, max_angle).astype(
        jnp.float32)
    mode_idx = jax.random.randint(ks[1], (), 0, len(_ROTATE_MODES))
    fill_with_noise = jax.random.bernoulli(ks[2])
    const_cval = jax.random.randint(ks[3], (), 0, 256).astype(jnp.float32)
    noise = jax.random.randint(ks[4], (c_img,) + x.shape[1:], 0, 256).astype(
        jnp.float32)
    if FAST_ROTATE:
        return _rotate_shear_planar(x, c_img, angle, mode_idx,
                                    fill_with_noise, const_cval, noise)
    return _rotate_4tap_planar(x, c_img, angle, mode_idx, fill_with_noise,
                               const_cval, noise)


# --------------------------------------------------------------------------
# Channel-last public API: thin wrappers around the planar cores.
# --------------------------------------------------------------------------


def _wrap_planar(core):
    def fn(key, image, mask, **kwargs):
        c_img = image.shape[-1]
        x = core(key, _to_planar(image, mask), c_img, **kwargs)
        return _from_planar(x, c_img)
    return fn


def additive_gaussian_noise(key, image, mask, mean_sd: float = 5.1) -> Pair:
    return _wrap_planar(_noise_planar)(key, image, mask, mean_sd=mean_sd)


def exposure(key, image, mask, mean_sd: float = 12.75) -> Pair:
    return _wrap_planar(_exposure_planar)(key, image, mask, mean_sd=mean_sd)


def random_eraser(key, image, mask, **kwargs) -> Pair:
    return _wrap_planar(_eraser_planar)(key, image, mask, **kwargs)


def fliplr(key, image, mask) -> Pair:
    del key
    return image[:, ::-1, :], mask[:, ::-1, :]


def translate(key, image, mask, max_shift: int = 23) -> Pair:
    return _wrap_planar(_translate_planar)(key, image, mask,
                                           max_shift=max_shift)


def rotate_img_mask(key, image, mask, max_angle: int = 45) -> Pair:
    return _wrap_planar(_rotate_planar)(key, image, mask, max_angle=max_angle)


def _apply_rotation(image, mask, angle, mode_idx, fill_with_noise,
                    const_cval, noise) -> Pair:
    """Deterministic 4-tap rotation core with channel-last tensors
    (`noise` channel-last [H, W, C_img]); kept for tests and the
    rotation-resampling parity experiments."""
    c_img = image.shape[-1]
    x = _rotate_4tap_planar(_to_planar(image, mask), c_img, angle, mode_idx,
                            fill_with_noise, const_cval,
                            jnp.moveaxis(noise, -1, 0))
    return _from_planar(x, c_img)


def _apply_rotation_shear(image, mask, angle, mode_idx, fill_with_noise,
                          const_cval, noise) -> Pair:
    """Shear-rotation core with channel-last tensors (`noise` channel-last);
    kept for the rotation-resampling parity experiments."""
    c_img = image.shape[-1]
    x = _rotate_shear_planar(_to_planar(image, mask), c_img, angle, mode_idx,
                             fill_with_noise, const_cval,
                             jnp.moveaxis(noise, -1, 0))
    return _from_planar(x, c_img)


def _roll_dynamic(arr, shift, axis):
    """Circular roll of channel-last [H, W, C] by a traced shift along a
    spatial axis (0 or 1) — matmul with a permutation matrix (see
    _roll_planar). Kept channel-last for the joint trainer's label rolls."""
    compute_dtype = arr.dtype if jnp.issubdtype(arr.dtype, jnp.floating) \
        else jnp.float32
    squeeze = arr.ndim == 2
    planar = arr[None] if squeeze else jnp.moveaxis(arr, -1, 0)
    out = _roll_planar(planar.astype(compute_dtype), shift, axis)
    out = out[0] if squeeze else jnp.moveaxis(out, 0, -1)
    if out.dtype != arr.dtype:
        out = jnp.round(out).astype(arr.dtype)
    return out


# Order mirrors the reference's cur_aug_funcs list (np_augmenters.py:132).
AUG_FUNCS = (random_eraser, translate, fliplr, additive_gaussian_noise,
             exposure, rotate_img_mask)

# Channel-last fn -> planar core, for compositions that keep the whole
# random prefix in the planar layout.
_PLANAR_CORES = {
    random_eraser: _eraser_planar,
    translate: _translate_planar,
    fliplr: _fliplr_planar,
    additive_gaussian_noise: _noise_planar,
    exposure: _exposure_planar,
    rotate_img_mask: _rotate_planar,
}


def _planar_cores_for(aug_funcs):
    cores = [_PLANAR_CORES.get(f) for f in aug_funcs]
    return cores if all(c is not None for c in cores) else None


def _compose_stagewise_planar(perm, num_to_apply, fn_keys, x, c_img, cores):
    """Direct stage loop on planar x: at stage s apply cores[perm[s]] if
    s < count.

    Under vmap every lax.switch branch is computed for every sample at every
    stage — n_stages x n_funcs function evaluations per sample. Used only
    when the function list has no recognized expensive member."""
    branches = [lambda k, xx, f=f: f(k, xx, c_img) for f in cores]
    # The stage loop is UNROLLED (python for, static n) rather than a nested
    # lax.scan: a scan-inside-scan body makes XLA:TPU compile time scale
    # with the *outer* trip count / vmap width (measured: +3 s per outer
    # step), which blows past the remote-compile budget at 59-step inner
    # loops. Unrolled, the whole augmentation is a flat region.
    for step in range(len(cores)):
        new_x = jax.lax.switch(perm[step], branches, fn_keys[step], x)
        x = jnp.where(step < num_to_apply, new_x, x)
    return x


def _compose_split_expensive_planar(perm, num_to_apply, fn_keys, x, c_img,
                                    cores, exp_idx: int):
    """Composition with the expensive function evaluated ONCE (planar).

    A random prefix of a permutation applies each function at most once, so
    the sequence factors exactly as
        cheap-suffix o [expensive?] o cheap-prefix
    around the expensive function's position. The cheap stages run the
    vmap-unrolled switch over the CHEAP branches only (plus an identity
    slot), and the expensive branch is computed once behind a single
    jnp.where — 1 evaluation instead of n_stages. Bit-identical to
    _compose_stagewise for the same draws (asserted in tests): stage s still
    applies cores[perm[s]] with fn_keys[s].

    Measured on v5e at run.sh shapes: the 59-step adapt's augmentation
    overhead drops ~4x (rotation was ~6/7 of it)."""
    n = len(cores)
    cheap = [f for i, f in enumerate(cores) if i != exp_idx]

    def identity(k, xx):
        del k
        return xx

    branches = [lambda k, xx, f=f: f(k, xx, c_img) for f in cheap]
    branches.append(identity)
    identity_slot = len(cheap)
    # Map original function index -> cheap branch index (exp_idx unused).
    cheap_index = [0] * n
    ci = 0
    for i in range(n):
        if i != exp_idx:
            cheap_index[i] = ci
            ci += 1
    cheap_index_arr = jnp.asarray(cheap_index)

    exp_pos = jnp.argmax(perm == exp_idx)  # position of expensive in perm
    exp_applied = exp_pos < num_to_apply

    def cheap_pass(xx, active_fn):
        for step in range(n):
            applied = (step < num_to_apply) & active_fn(step)
            idx = jnp.where(applied, cheap_index_arr[perm[step]],
                            identity_slot)
            xx = jax.lax.switch(idx, branches, fn_keys[step], xx)
        return xx

    x = cheap_pass(x, lambda s: s < exp_pos)
    exp_x = cores[exp_idx](fn_keys[exp_pos], x, c_img)
    x = jnp.where(exp_applied, exp_x, x)
    return cheap_pass(x, lambda s: s > exp_pos)


def _compose_stagewise(perm, num_to_apply, fn_keys, image, mask, aug_funcs):
    """Channel-last facade over the planar stage loop (falls back to a
    channel-last switch for unregistered custom function lists)."""
    cores = _planar_cores_for(aug_funcs)
    c_img = image.shape[-1]
    if cores is not None:
        x = _compose_stagewise_planar(perm, num_to_apply, fn_keys,
                                      _to_planar(image, mask), c_img, cores)
        return _from_planar(x, c_img)
    branches = [lambda k, im, mk, f=f: f(k, im, mk) for f in aug_funcs]
    aug_img, aug_msk = image, mask
    for step in range(len(aug_funcs)):
        new_img, new_msk = jax.lax.switch(perm[step], branches,
                                          fn_keys[step], aug_img, aug_msk)
        keep_new = step < num_to_apply
        aug_img = jnp.where(keep_new, new_img, aug_img)
        aug_msk = jnp.where(keep_new, new_msk, aug_msk)
    return aug_img, aug_msk


def _compose_split_expensive(perm, num_to_apply, fn_keys, image, mask,
                             aug_funcs, exp_idx: int):
    """Channel-last facade over the rotation-once composition.

    Registered lists route through the planar stage loop; custom
    (unregistered) lists keep the expensive-evaluated-once factorization on
    (image, mask) pairs directly — same algebra, so a user-supplied
    `aug_funcs` containing `rotate_img_mask` never regresses to computing
    the rotation at all n stages (the vmapped-switch pathology)."""
    cores = _planar_cores_for(aug_funcs)
    if cores is not None:
        c_img = image.shape[-1]
        x = _compose_split_expensive_planar(perm, num_to_apply, fn_keys,
                                            _to_planar(image, mask), c_img,
                                            cores, exp_idx)
        return _from_planar(x, c_img)

    n = len(aug_funcs)
    cheap = [f for i, f in enumerate(aug_funcs) if i != exp_idx]

    def identity(k, im, mk):
        del k
        return im, mk

    branches = [lambda k, im, mk, f=f: f(k, im, mk) for f in cheap]
    branches.append(identity)
    identity_slot = len(cheap)
    cheap_index = [0] * n
    ci = 0
    for i in range(n):
        if i != exp_idx:
            cheap_index[i] = ci
            ci += 1
    cheap_index_arr = jnp.asarray(cheap_index)

    exp_pos = jnp.argmax(perm == exp_idx)
    exp_applied = exp_pos < num_to_apply

    def cheap_pass(im, mk, active_fn):
        for step in range(n):
            applied = (step < num_to_apply) & active_fn(step)
            idx = jnp.where(applied, cheap_index_arr[perm[step]],
                            identity_slot)
            im, mk = jax.lax.switch(idx, branches, fn_keys[step], im, mk)
        return im, mk

    im, mk = cheap_pass(image, mask, lambda s: s < exp_pos)
    exp_im, exp_mk = aug_funcs[exp_idx](fn_keys[exp_pos], im, mk)
    im = jnp.where(exp_applied, exp_im, im)
    mk = jnp.where(exp_applied, exp_mk, mk)
    return cheap_pass(im, mk, lambda s: s > exp_pos)


def apply_augmentations(key, image: jnp.ndarray, mask: jnp.ndarray,
                        prob_to_return_original: Optional[float] = None,
                        aug_funcs: Sequence = AUG_FUNCS) -> Pair:
    """Randomly compose augmentations on one (image, mask) pair.

    With probability `prob_to_return_original` (a traced scalar is fine;
    defaults to 1/(len(aug_funcs)+1) like Augmenter.__init__) the input is
    returned unchanged. Otherwise a uniformly-random prefix of length
    1..len(aug_funcs) of a uniformly-random permutation of `aug_funcs` is
    applied in order (np_augmenters.py:144-156).
    """
    n = len(aug_funcs)
    if prob_to_return_original is None:
        prob_to_return_original = 1.0 / (n + 1)
    k_gate, k_perm, k_count, k_fns = jax.random.split(key, 4)
    skip = jax.random.uniform(k_gate, ()) <= prob_to_return_original
    perm = jax.random.permutation(k_perm, n)
    num_to_apply = jax.random.randint(k_count, (), 1, n + 1)
    fn_keys = jax.random.split(k_fns, n)

    cores = _planar_cores_for(aug_funcs)
    if cores is not None:
        # Single planar region: one stack, the whole composition in the
        # [C, H, W] layout, one unstack — including the skip gate.
        c_img = image.shape[-1]
        x = _to_planar(image, mask)
        if rotate_img_mask in aug_funcs:
            exp_idx = list(aug_funcs).index(rotate_img_mask)
            aug_x = _compose_split_expensive_planar(
                perm, num_to_apply, fn_keys, x, c_img, cores, exp_idx)
        else:
            aug_x = _compose_stagewise_planar(
                perm, num_to_apply, fn_keys, x, c_img, cores)
        return _from_planar(jnp.where(skip, x, aug_x), c_img)

    if rotate_img_mask in aug_funcs:
        aug_img, aug_msk = _compose_split_expensive(
            perm, num_to_apply, fn_keys, image, mask, aug_funcs,
            list(aug_funcs).index(rotate_img_mask))
    else:
        aug_img, aug_msk = _compose_stagewise(
            perm, num_to_apply, fn_keys, image, mask, aug_funcs)
    image = jnp.where(skip, image, aug_img)
    mask = jnp.where(skip, mask, aug_msk)
    return image, mask


def _batch_keys(key, batch: int, key_offset=0, key_total=None) -> jnp.ndarray:
    """Per-sample keys for a (possibly sharded) batch.

    The unsharded form is `split(key, B)`. When the batch is the local slice
    of a larger batch split over a mesh data axis, `key_total` is the global
    batch size and `key_offset` this shard's first global sample position,
    so every global sample draws the same augmentations wherever it runs."""
    total = batch if key_total is None else key_total
    keys = jax.random.split(key, total)
    if key_total is None:
        return keys
    return jax.lax.dynamic_slice_in_dim(keys, key_offset, batch)


def augment_batch(key, images: jnp.ndarray, masks: jnp.ndarray,
                  prob_to_return_original=None, key_offset=0,
                  key_total=None) -> Pair:
    """Per-sample augmentation over a batch: [B, H, W, C] inputs."""
    keys = _batch_keys(key, images.shape[0], key_offset, key_total)
    return jax.vmap(
        lambda k, im, mk: apply_augmentations(k, im, mk, prob_to_return_original)
    )(keys, images, masks)


# Single-launch fused composition (ops/pallas_augment.full_pass): rotation
# runs IN-KERNEL via MXU DFT-matmul shears, so one scan iteration issues ONE
# pallas_call instead of two + an XLA rotation program (VERDICT r4 #3).
# Default set by on-chip measurement (docs/PERF_NOTES.md round-5 lever,
# experiments/fused_aug_bench.json): Mosaic-compiles and runs on the real
# chip; 59-rep aug scan 53.6 -> 41.8 ms (-22%), chained FOMAML* step
# 1.328 -> 1.279 s (+3.8%, 3.91 tasks/s/chip). The 59-batch one-launch
# precompute variant (VERDICT r4 option (b)) measured -2.3% — HBM staging
# still loses; refuted.
PALLAS_FUSED_SINGLE_LAUNCH = True


def augment_batch_pallas(key, images: jnp.ndarray, masks: jnp.ndarray,
                         prob_to_return_original=None,
                         interpret: Optional[bool] = None, key_offset=0,
                         key_total=None,
                         fused: Optional[bool] = None) -> Pair:
    """Batch augmentation with the cheap composition fused in Pallas.

    Same composition semantics as `augment_batch` (gate, random prefix of a
    random permutation, rotation evaluated once in XLA between the two
    fused cheap passes), but the 5 cheap functions run as ONE VMEM pass per
    side of the rotation (ops/pallas_augment.cheap_pass) instead of the
    vmapped 6-stage switch that evaluates every branch for every sample.
    Gate/permutation/count draws stay in jax.random; per-op randomness
    inside the kernel uses the on-core PRNG, so outputs are
    distributionally — not bitwise — equivalent to the jnp path (tested).

    `interpret=None` auto-selects Pallas interpret mode off-TPU (tests/CI;
    via force_tpu_interpret_mode, whose interpreter emulates the TPU PRNG
    primitives that the plain HLO interpreter lacks).
    """
    import contextlib
    from jax.experimental.pallas import tpu as pltpu
    from mliis_tpu.ops.pallas_augment import cheap_pass, full_pass

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fused is None:
        fused = PALLAS_FUSED_SINGLE_LAUNCH

    def ctx():
        return (pltpu.force_tpu_interpret_mode() if interpret
                else contextlib.nullcontext())
    n = NUM_AUG_FUNCS
    if prob_to_return_original is None:
        prob_to_return_original = 1.0 / (n + 1)
    exp_idx = AUG_FUNCS.index(rotate_img_mask)
    c_img = images.shape[-1]
    b = images.shape[0]
    keys = _batch_keys(key, b, key_offset, key_total)

    def draws(k):
        k_gate, k_perm, k_count, k_fns = jax.random.split(k, 4)
        skip = jax.random.uniform(k_gate, ()) <= prob_to_return_original
        perm = jax.random.permutation(k_perm, n)
        num = jax.random.randint(k_count, (), 1, n + 1)
        seeds = jax.random.randint(jax.random.fold_in(k_fns, 0), (2,), 0,
                                   jnp.iinfo(jnp.int32).max)
        k_rot = jax.random.fold_in(k_fns, 1)
        return skip, perm, num, seeds, k_rot

    skip, perm, num, seeds, rot_keys = jax.vmap(draws)(keys)
    x = jax.vmap(_to_planar)(images, masks)      # [B, C_tot, H, W]

    if fused and images.shape[1] == images.shape[2]:
        # Single launch: rotation in-kernel (MXU DFT-matmul shears). The
        # rotation's parameter draws keep _rotate_planar's key discipline
        # and distributions (split(k_rot, 5); the noise child is replaced
        # by the in-kernel border-noise plane).
        def rot_draws(k):
            ks = jax.random.split(k, 5)
            angle = jax.random.randint(ks[0], (), -45, 45)
            mode_idx = jax.random.randint(ks[1], (), 0, len(_ROTATE_MODES))
            fill = jax.random.bernoulli(ks[2]).astype(jnp.int32)
            cval = jax.random.randint(ks[3], (), 0, 256)
            return jnp.stack([angle, mode_idx, fill, cval])

        rot_params = jax.vmap(rot_draws)(rot_keys)
        with ctx():
            full = full_pass(seeds[:, 0], x, perm, num, rot_params,
                             c_img=c_img)
        out = jnp.where(skip[:, None, None, None], x, full)
        return jax.vmap(lambda v: _from_planar(v, c_img))(out)

    exp_pos = jnp.argmax(perm == exp_idx, axis=1).astype(jnp.int32)
    exp_applied = exp_pos < num

    with ctx():
        pre = cheap_pass(seeds[:, 0], x, perm, num,
                         jnp.stack([jnp.zeros_like(exp_pos), exp_pos],
                                   axis=1),
                         c_img=c_img)
    rotated = jax.vmap(lambda k, v: _rotate_planar(k, v, c_img))(rot_keys,
                                                                 pre)
    mid = jnp.where(exp_applied[:, None, None, None], rotated, pre)
    with ctx():
        post = cheap_pass(seeds[:, 1], mid, perm, num,
                          jnp.stack([exp_pos + 1,
                                     jnp.full_like(exp_pos, n)], axis=1),
                          c_img=c_img)
    out = jnp.where(skip[:, None, None, None], x, post)
    return jax.vmap(lambda v: _from_planar(v, c_img))(out)
