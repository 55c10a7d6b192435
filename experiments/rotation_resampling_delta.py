"""Parity-risk experiment: rotation resampling method vs adaptation mIoU.

The reference rotates with scipy order-3 splines for images and order-0 for
masks (/root/reference/augmenters/np_augmenters.py:100-129). The TPU engine
substitutes (a) an FFT 3-shear rotation (exact fractional translation per
lane, wrap-style borders outside constant mode) or (b) a 4-tap bilinear
sampler (order-1, exact border folds). This script quantifies the
distributional effect of that substitution on what actually matters — the
mIoU reached by k-shot adaptation under rotation-augmented inner loops —
holding every random draw (angles, modes, fills, batch order, init, query
sets) FIXED across the three variants, so the only difference is the
resampling kernel. Output: experiments/rotation_resampling_delta.json and
docs/ROTATION_RESAMPLING_DELTA.md numbers.

Run: python experiments/rotation_resampling_delta.py [--tasks 6 --reps 3]
"""
import argparse
import json

import jax
jax.config.update("jax_platforms", "cpu")  # CPU experiment (CLAUDE.md)
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from mliis_tpu.data.synthetic import make_synthetic_store
from mliis_tpu.meta.inner_loop import (LossConfig, OptimizerConfig,
                                       apply_optimizer, init_model_state,
                                       make_loss_and_grad)
from mliis_tpu.ops import augment
from mliis_tpu.ops.metrics import batched_hard_iou, ci95

import sys
sys.path.insert(0, "tests")
from tiny_model import TinySeg  # noqa: E402

MODES = ("reflect", "constant", "mirror", "wrap")


def draw_rotation_params(rng, steps, batch):
    return {
        "angle": rng.integers(-45, 45, (steps, batch)).astype(np.float32),
        "mode": rng.integers(0, 4, (steps, batch)),
        "fill_noise": rng.random((steps, batch)) < 0.5,
        "cval": rng.integers(0, 256, (steps, batch)).astype(np.float32),
    }


def rotate_scipy(image, mask, angle, mode_idx, fill_noise, cval, noise_rng):
    """Reference-faithful rotation: order-3 image, order-0 mask
    (np_augmenters.py:100-129; constant mode noise fill per :118-123)."""
    mode = MODES[int(mode_idx)]
    if mode == "constant" and fill_noise:
        img = ndimage.rotate(image, angle, reshape=False, order=3,
                             mode="constant", cval=-256.0)
        noise = noise_rng.integers(0, 256, image.shape).astype(np.float32)
        img = np.where(img <= -128.0, noise, img)
    else:
        img = ndimage.rotate(image, angle, reshape=False, order=3, mode=mode,
                             cval=float(cval))
    msk = ndimage.rotate(mask, angle, reshape=False, order=0, mode=mode,
                         cval=0.0)
    if mode == "constant":
        # OOB mask pixels -> background one-hot.
        bg = np.zeros_like(msk)
        bg[..., 0] = 1.0
        oob = msk.sum(-1) < 0.5
        msk = np.where(oob[..., None], bg, msk)
    return np.clip(img, 0.0, 255.0), msk


def make_jax_rotate(fast: bool):
    def rot(image, mask, angle, mode_idx, fill_noise, cval, noise):
        fn = (augment._apply_rotation_shear if fast
              else augment._apply_rotation)
        return fn(jnp.asarray(image), jnp.asarray(mask), jnp.float32(angle),
                  jnp.int32(mode_idx), jnp.bool_(fill_noise),
                  jnp.float32(cval), jnp.asarray(noise))
    return jax.jit(rot)


def calibrate_scipy_angle_sign(rng):
    """scipy rotates counterclockwise; match our convention empirically."""
    img = rng.random((32, 32, 3)).astype(np.float32) * 255
    msk = np.zeros((32, 32, 2), np.float32)
    msk[..., 0] = 1.0
    jrot = make_jax_rotate(fast=False)
    ours = np.asarray(jrot(img, msk, 20.0, 3, False, 0.0,
                           np.zeros_like(img))[0])
    best_sign, best_err = 1, np.inf
    for sign in (1, -1):
        sp = ndimage.rotate(img, sign * 20.0, reshape=False, order=1,
                            mode="wrap")
        err = float(np.abs(sp[8:-8, 8:-8] - ours[8:-8, 8:-8]).mean())
        if err < best_err:
            best_sign, best_err = sign, err
    assert best_err < 20.0, "convention mismatch: err {}".format(best_err)
    return best_sign


def prepare_batches(variant, support_imgs, support_msks, idx_matrix, params,
                    noise_seed, scipy_sign):
    """[steps, B, H, W, C] rotated batches; one rotation per sample per step."""
    steps, batch = idx_matrix.shape
    noise_rng = np.random.default_rng(noise_seed)
    if variant in ("fft_shear", "bilinear_4tap"):
        jrot = make_jax_rotate(fast=(variant == "fft_shear"))
    out_i = np.zeros((steps, batch) + support_imgs.shape[1:], np.float32)
    out_m = np.zeros((steps, batch) + support_msks.shape[1:], np.float32)
    for s in range(steps):
        for b in range(batch):
            img = support_imgs[idx_matrix[s, b]]
            msk = support_msks[idx_matrix[s, b]]
            noise = noise_rng.integers(0, 256, img.shape).astype(np.float32)
            a, m, fn, cv = (params["angle"][s, b], params["mode"][s, b],
                            params["fill_noise"][s, b], params["cval"][s, b])
            if variant == "scipy_order3":
                oi, om = rotate_scipy(img, msk, scipy_sign * a, m, fn, cv,
                                      noise_rng)
            else:
                oi, om = jrot(img, msk, a, m, fn, cv, noise)
                oi, om = np.asarray(oi), np.asarray(om)
            out_i[s, b] = oi
            out_m[s, b] = om
    return out_i, out_m


def adapt_and_eval(model, loss_cfg, opt_cfg, state, batches_i, batches_m,
                   query_i, query_m, lr):
    loss_and_grad = jax.jit(make_loss_and_grad(model, loss_cfg))
    opt_apply = jax.jit(lambda p, g, o: apply_optimizer(p, g, o, lr, opt_cfg))
    params, bn, opt = state.params, state.batch_stats, state.opt
    key = jax.random.PRNGKey(0)
    for s in range(batches_i.shape[0]):
        (_, bn), grads = loss_and_grad(params, bn,
                                       jnp.asarray(batches_i[s]),
                                       jnp.asarray(batches_m[s]), key,
                                       jnp.float32(0.0))
        params, opt = opt_apply(params, grads, opt)
    _, probs = model.apply({"params": params, "batch_stats": bn},
                           jnp.asarray(query_i), train=False)
    preds = (probs > 0.5).astype(jnp.float32)
    return [float(x) for x in batched_hard_iou(preds, jnp.asarray(query_m))]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", type=int, default=6)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--shots", type=int, default=6)
    parser.add_argument("--query", type=int, default=4)
    parser.add_argument("--img", type=int, default=32)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--out",
                        default="experiments/rotation_resampling_delta.json")
    args = parser.parse_args()

    store = make_synthetic_store(num_tasks=args.tasks,
                                 examples_per_task=args.shots + args.query,
                                 image_size=args.img, seed=5)
    model = TinySeg()
    loss_cfg = LossConfig(l2=False)
    opt_cfg = OptimizerConfig(name="adam")
    state = init_model_state(model, jax.random.PRNGKey(0), args.img, opt_cfg)
    rng = np.random.default_rng(11)
    scipy_sign = calibrate_scipy_angle_sign(rng)
    print("scipy angle sign: {}".format(scipy_sign))

    results = {v: [] for v in ("scipy_order3", "fft_shear", "bilinear_4tap")}
    for t in range(args.tasks):
        n = int(store.counts[t])
        imgs = store.images[t, :n].astype(np.float32)
        msks_u8 = store.masks[t, :n].astype(np.float32)
        msks = np.stack([255.0 - msks_u8, msks_u8], -1) / 255.0
        for rep in range(args.reps):
            perm = rng.permutation(n)
            sup, qry = perm[:args.shots], perm[args.shots:]
            idx_matrix = rng.integers(0, args.shots,
                                      (args.steps, args.batch))
            rot_params = draw_rotation_params(rng, args.steps, args.batch)
            noise_seed = int(rng.integers(0, 2**31))
            for variant in results:
                bi, bm = prepare_batches(variant, imgs[sup], msks[sup],
                                         idx_matrix, rot_params, noise_seed,
                                         scipy_sign)
                ious = adapt_and_eval(model, loss_cfg, opt_cfg, state, bi, bm,
                                      imgs[qry], msks[qry], args.lr)
                results[variant].append(float(np.nanmean(ious)))
        print("task {} done".format(t), flush=True)

    summary = {v: {"mean_miou": float(np.mean(xs)), "ci95": ci95(xs),
                   "n": len(xs)} for v, xs in results.items()}
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "per_run": results}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
