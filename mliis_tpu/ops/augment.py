"""On-device image+mask augmentation kernels for episodic training.

TPU-native replacement for the reference's host-numpy augmentation engine
(/root/reference/augmenters/np_augmenters.py). Every augmentation is a pure
jnp function of (PRNG key, image, mask), shape-preserving and jit/vmap-safe,
so per-sample augmentation fuses into the same XLA program as batch assembly
and the inner-loop SGD steps — no host round-trips.

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


def _mask_background_fill(mask: jnp.ndarray) -> jnp.ndarray:
    """One-hot background vector [1, 0, ...] broadcastable to mask."""
    fill = jnp.zeros((mask.shape[-1],), mask.dtype).at[0].set(1.0)
    return jnp.broadcast_to(fill, mask.shape)


def additive_gaussian_noise(key, image, mask, mean_sd: float = 5.1) -> Pair:
    k1, k2 = jax.random.split(key)
    sd = jnp.abs(mean_sd + jax.random.normal(k1, ()))
    noise = sd * jax.random.normal(k2, image.shape)
    return jnp.clip(image + noise, 0.0, 255.0), mask


def exposure(key, image, mask, mean_sd: float = 12.75) -> Pair:
    k1, k2 = jax.random.split(key)
    sd = jnp.abs(mean_sd + jax.random.normal(k1, ()))
    shift = sd * jax.random.normal(k2, ())
    return jnp.clip(image + shift, 0.0, 255.0), mask


def random_eraser(key, image, mask, s_l: float = 0.02, s_h: float = 0.10,
                  r_1: float = 0.3, r_2: float = 1.0 / 0.3,
                  v_l: float = 0.0, v_h: float = 255.0) -> Pair:
    img_h, img_w = image.shape[0], image.shape[1]
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
              & (cols >= left) & (cols < left + w))[..., None]
    image = jnp.where(region, c, image)
    mask = jnp.where(region, _mask_background_fill(mask), mask)
    return image, mask


def fliplr(key, image, mask) -> Pair:
    del key
    return image[:, ::-1, :], mask[:, ::-1, :]


def _roll_dynamic(arr, shift, axis):
    """Circular roll of [H, W, C] by a traced per-sample shift.

    Under vmap a dynamic-slice/jnp.roll with per-sample starts lowers to a
    gather, which is pathologically slow on TPU (measured ~5 s for 472
    images). A roll is a permutation, so it is expressed as a matmul with a
    permutation matrix built from iota comparisons — pure MXU work
    (~30 GFLOP for the same batch, sub-millisecond).
    """
    n = arr.shape[axis]
    shift = jnp.mod(shift, n)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # out[i] = in[i - shift mod n]  ->  P[i, j] = (j == i - shift)
    compute_dtype = arr.dtype if jnp.issubdtype(arr.dtype, jnp.floating) \
        else jnp.float32
    perm = (jnp.mod(i - shift, n) == j).astype(compute_dtype)
    moved = jnp.moveaxis(arr, axis, 0)
    flat = moved.reshape(n, -1).astype(compute_dtype)
    out = jnp.dot(perm, flat, preferred_element_type=compute_dtype)
    out = jnp.moveaxis(out.reshape(moved.shape), 0, axis)
    if out.dtype != arr.dtype:
        out = jnp.round(out).astype(arr.dtype)
    return out


def _shift_along_axis(key, arr, axis, shift, roll, fill):
    """Roll `arr` by `shift` (traced, may be negative) along `axis`; when not
    rolling, overwrite the wrapped-in stripe with `fill`."""
    rolled = _roll_dynamic(arr, shift, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, rolled.shape[:2], axis)[..., None]
    size = arr.shape[axis]
    # shift > 0: stripe is [0, shift); shift < 0: stripe is [size+shift, size).
    stripe = jnp.where(shift >= 0, idx < shift, idx >= size + shift)
    filled = jnp.where(stripe, fill, rolled)
    return jnp.where(roll, rolled, filled)


def translate(key, image, mask, max_shift: int = 23) -> Pair:
    ks = jax.random.split(key, 5)
    vert = jax.random.bernoulli(ks[0])
    direction = jax.random.bernoulli(ks[1])
    shift = jax.random.randint(ks[2], (), 1, max_shift + 1)
    shift = jnp.where(direction, shift, -shift)
    roll = jax.random.bernoulli(ks[3])
    axis = jnp.where(vert, 0, 1)

    img_fill = jnp.broadcast_to(
        jax.random.uniform(ks[4], (image.shape[-1],), minval=0.0, maxval=255.0),
        image.shape)
    mask_fill = _mask_background_fill(mask)

    def _do(ax):
        img = _shift_along_axis(key, image, ax, shift, roll, img_fill)
        msk = _shift_along_axis(key, mask, ax, shift, roll, mask_fill)
        return img, msk

    img0, msk0 = _do(0)
    img1, msk1 = _do(1)
    image = jnp.where(axis == 0, img0, img1)
    mask = jnp.where(axis == 0, msk0, msk1)
    return image, mask


def _rotation_coords(shape, angle_deg):
    """Input-space sampling coordinates for a rotation about the center."""
    h, w = shape[0], shape[1]
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


# Toggle for the gather-free shear rotation (see _apply_rotation_shear).
FAST_ROTATE = True


def _shear(stacked, shifts, axis):
    """Inverse-sampling circular shear: out[.., p, ..] = in(p - shifts[q])
    along `axis`, shifts varying along the other axis. Implemented as an
    FFT phase shift — exact fractional translation per lane, a handful of
    224-point FFTs (matmul-sized on TPU, ~0.1 ms for a 64-image batch) and
    no gathers or per-shift copies (a static-roll-sum formulation
    materialized 350+ full-size temps; a gather formulation ran ~3 ms per
    image)."""
    if axis == 0:
        # Shear rows by transposing and shearing columns, so every FFT runs
        # along the same axis and XLA sees one transform layout for all
        # three shears (neutral on measured step time; keeps the layout
        # story uniform for the copy-reduction work in docs/PERF_NOTES.md).
        return jnp.swapaxes(_shear(jnp.swapaxes(stacked, 0, 1), shifts,
                                   axis=1), 0, 1)
    n = stacked.shape[axis]
    spectrum = jnp.fft.fft(stacked, axis=axis)
    k = jnp.fft.fftfreq(n) * n
    shape = [1, 1, 1]
    shape[axis] = n
    k = k.reshape(shape)
    other = 1 - axis
    sshape = [1, 1, 1]
    sshape[other] = shifts.shape[0]
    s = shifts.reshape(sshape)
    phase = jnp.exp((-2j * jnp.pi / n) * k * s)
    return jnp.fft.ifft(spectrum * phase, axis=axis).real.astype(
        stacked.dtype)


def _apply_rotation_shear(image, mask, angle, mode_idx, fill_with_noise,
                          const_cval, noise) -> Pair:
    """Gather-free rotation: the Paeth 3-shear decomposition
    R(a) = Sx(-tan(a/2)) Sy(sin a) Sx(-tan(a/2)), each shear a static-roll
    sum (MXU/VPU work only). Valid for |angle| <= 45 (the reference's
    range). Border semantics: constant mode is exact (out-of-bounds pixels
    from the true rotation coords get cval/noise and the mask gets
    background); the reflect/mirror/wrap modes all present wrap-style
    borders here (the shears roll circularly) — a documented deviation
    confined to the out-of-frame border bands of a random augmentation.
    Masks ride through the bilinear shears and are snapped back to one-hot
    (vs. the reference's order-0 resampling: boundary pixels may differ)."""
    h, w = image.shape[0], image.shape[1]
    c_img = image.shape[-1]
    theta = -angle * jnp.pi / 180.0  # match _apply_rotation's convention
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    rows = (jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0) - cy)[:, 0]
    cols = (jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0) - cx)[:, 0]

    stacked = jnp.concatenate([image, mask], axis=-1)
    stacked = _shear(stacked, alpha * rows, axis=1)
    stacked = _shear(stacked, beta * cols, axis=0)
    stacked = _shear(stacked, alpha * rows, axis=1)

    img = stacked[..., :c_img]
    msk = stacked[..., c_img:]
    # Snap the mask back to one-hot (argmax over channels).
    fg = (msk[..., 1:] >= msk[..., :1]).astype(msk.dtype) \
        if msk.shape[-1] == 2 else None
    if fg is not None:
        msk = jnp.concatenate([1.0 - fg, fg], axis=-1)

    # Out-of-bounds region from the exact rotation coordinates.
    src_y, src_x = _rotation_coords(image.shape, angle)
    oob = ((src_y < -0.5) | (src_y > h - 0.5)
           | (src_x < -0.5) | (src_x > w - 0.5))[..., None]
    is_constant = mode_idx == 1
    cval_img = jnp.where(fill_with_noise, noise,
                         jnp.broadcast_to(const_cval, image.shape))
    img = jnp.where(is_constant & oob, cval_img, img)
    msk = jnp.where(is_constant & oob, _mask_background_fill(mask), msk)
    return img, msk


def rotate_img_mask(key, image, mask, max_angle: int = 45) -> Pair:
    """Rotation with a random border mode.

    Implemented as a single fused 4-tap bilinear sampler over the stacked
    image+mask channels with arithmetic coordinate folding per mode — ONE
    shared index computation and 4 gathers total. (A naive per-mode
    map_coordinates construction materializes ~24 full-size index tensors;
    at the precomputed-augmentation batch widths this alone cost tens of GB
    of XLA temps and was the eval-path OOM.)

    Image is sampled bilinearly (order-1 stand-in for scipy's order-3), the
    mask with nearest-neighbor (order 0). Constant mode fills out-of-bounds
    image pixels with a random constant or per-pixel noise and the mask with
    background (np_augmenters.py:100-129).
    """
    ks = jax.random.split(key, 4)
    angle = jax.random.randint(ks[0], (), -max_angle, max_angle).astype(
        jnp.float32)
    mode_idx = jax.random.randint(ks[1], (), 0, len(_ROTATE_MODES))
    fill_with_noise = jax.random.bernoulli(ks[2])
    const_cval = jax.random.randint(ks[3], (), 0, 256).astype(jnp.float32)
    noise = jax.random.randint(key, image.shape, 0, 256).astype(jnp.float32)
    if FAST_ROTATE:
        return _apply_rotation_shear(image, mask, angle, mode_idx,
                                     fill_with_noise, const_cval, noise)
    return _apply_rotation(image, mask, angle, mode_idx, fill_with_noise,
                           const_cval, noise)


def _apply_rotation(image, mask, angle, mode_idx, fill_with_noise,
                    const_cval, noise) -> Pair:
    """Deterministic rotation core (mode_idx indexes _ROTATE_MODES)."""
    h, w = image.shape[0], image.shape[1]
    c_img = image.shape[-1]
    src_y, src_x = _rotation_coords(image.shape, angle)
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

    stacked = jnp.concatenate([image, mask], axis=-1)  # [H, W, C_img+C_msk]
    flat = stacked.reshape(h * w, -1)

    sampled = 0.0
    weight_mass = 0.0
    tap_values = []
    for tap_w, yt, xt in taps:
        vals = jnp.take(flat, (yt * w + xt).reshape(-1), axis=0).reshape(
            h, w, -1)
        tap_values.append(vals)
        sampled = sampled + tap_w[..., None] * vals
        weight_mass = weight_mass + tap_w

    # Image: bilinear blend; in constant mode missing mass blends toward the
    # fill value (random constant, or a -256 sentinel for noise mode whose
    # fully-out pixels become per-pixel noise — reference semantics).
    img_sampled = sampled[..., :c_img]
    cval_eff = jnp.where(fill_with_noise, -256.0, const_cval)
    img = img_sampled + (1.0 - weight_mass)[..., None] * cval_eff
    fully_out = (weight_mass <= 1e-6)[..., None]
    img = jnp.where(fully_out & fill_with_noise, noise, img)
    img = jnp.where(is_constant, img, img_sampled)

    # Mask: nearest tap (order 0) — pick the tap with the largest weight.
    near = (wy >= 0.5).astype(jnp.int32) * 2 + (wx >= 0.5).astype(jnp.int32)
    msk = tap_values[0][..., c_img:]
    for t in range(1, 4):
        msk = jnp.where((near == t)[..., None], tap_values[t][..., c_img:],
                        msk)
    # Constant mode: the nearest sample point out of bounds -> background.
    near_y = jnp.round(src_y)
    near_x = jnp.round(src_x)
    oob = ((near_y < 0) | (near_y > h - 1) | (near_x < 0)
           | (near_x > w - 1))[..., None]
    msk = jnp.where(is_constant & oob, _mask_background_fill(mask), msk)
    return img, msk


# Order mirrors the reference's cur_aug_funcs list (np_augmenters.py:132).
AUG_FUNCS = (random_eraser, translate, fliplr, additive_gaussian_noise,
             exposure, rotate_img_mask)


def _compose_stagewise(perm, num_to_apply, fn_keys, image, mask, aug_funcs):
    """Direct stage loop: at stage s apply aug_funcs[perm[s]] if s < count.

    Under vmap every lax.switch branch is computed for every sample at every
    stage — n_stages x n_funcs function evaluations per sample. Used only
    when the function list has no recognized expensive member."""
    branches = [lambda k, im, mk, f=f: f(k, im, mk) for f in aug_funcs]
    # The stage loop is UNROLLED (python for, static n) rather than a nested
    # lax.scan: a scan-inside-scan body makes XLA:TPU compile time scale
    # with the *outer* trip count / vmap width (measured: +3 s per outer
    # step), which blows past the remote-compile budget at 59-step inner
    # loops. Unrolled, the whole augmentation is a flat region.
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
    """Composition with the expensive function evaluated ONCE.

    A random prefix of a permutation applies each function at most once, so
    the sequence factors exactly as
        cheap-suffix o [expensive?] o cheap-prefix
    around the expensive function's position. The cheap stages run the
    vmap-unrolled switch over the CHEAP branches only (plus an identity
    slot), and the expensive branch is computed once behind a single
    jnp.where — 1 evaluation instead of n_stages. Bit-identical to
    _compose_stagewise for the same draws (asserted in tests): stage s still
    applies aug_funcs[perm[s]] with fn_keys[s].

    Measured on v5e at run.sh shapes: the 59-step adapt's augmentation
    overhead drops ~4x (rotation was ~6/7 of it)."""
    n = len(aug_funcs)
    cheap = [f for i, f in enumerate(aug_funcs) if i != exp_idx]

    def identity(k, im, mk):
        del k
        return im, mk

    branches = [lambda k, im, mk, f=f: f(k, im, mk) for f in cheap]
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

    def cheap_pass(img, msk, active_fn):
        for step in range(n):
            applied = (step < num_to_apply) & active_fn(step)
            idx = jnp.where(applied, cheap_index_arr[perm[step]],
                            identity_slot)
            img, msk = jax.lax.switch(idx, branches, fn_keys[step], img, msk)
        return img, msk

    img, msk = cheap_pass(image, mask, lambda s: s < exp_pos)
    exp_img, exp_msk = aug_funcs[exp_idx](fn_keys[exp_pos], img, msk)
    img = jnp.where(exp_applied, exp_img, img)
    msk = jnp.where(exp_applied, exp_msk, msk)
    img, msk = cheap_pass(img, msk, lambda s: s > exp_pos)
    return img, msk


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

    if rotate_img_mask in aug_funcs:
        exp_idx = list(aug_funcs).index(rotate_img_mask)
        aug_img, aug_msk = _compose_split_expensive(
            perm, num_to_apply, fn_keys, image, mask, aug_funcs, exp_idx)
    else:
        aug_img, aug_msk = _compose_stagewise(
            perm, num_to_apply, fn_keys, image, mask, aug_funcs)

    image = jnp.where(skip, image, aug_img)
    mask = jnp.where(skip, mask, aug_msk)
    return image, mask


def augment_batch(key, images: jnp.ndarray, masks: jnp.ndarray,
                  prob_to_return_original=None) -> Pair:
    """Per-sample augmentation over a batch: [B, H, W, C] inputs."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda k, im, mk: apply_augmentations(k, im, mk, prob_to_return_original)
    )(keys, images, masks)
