"""Dataset converters: FSS-1000 raw images -> task shards.

Parity with the reference converters:
  - per-task shards (data/fss_1000_image_to_tfrecord.py): each class
    directory of {i}.jpg + {i}.png mask pairs becomes one gzip tfrecord (or
    npz) shard; images must be exactly 224x224 or the sample is skipped;
    masks take the first channel (fg encoded 255);
  - joint shards (data/fss_1000_image_to_joint_tfrecord_shards.py):
    convert_fss_1000_joint writes compact class-index-map shards (uint16,
    not the reference's dense one-hot channels) and load_joint_shards reads
    them back for the joint CLI's --joint_shard_dir path
    (joint_train/data/input_fn.py:23-133 equivalent). Alternatively the
    JointDataset derives the same integer class maps straight from a
    per-task store (mliis_tpu/joint/trainer.py), so either conversion
    feeds joint training.

Host-side multiprocessing mirrors the reference converter's Pool usage for
the offline path.
"""
import glob
import os
from multiprocessing import Pool
from typing import List, Optional, Tuple

import numpy as np

from mliis_tpu.data import tfrecord
from mliis_tpu.data.manifests import IMAGE_DIMS


def _read_image(path: str) -> Optional[np.ndarray]:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im)


def load_class_dir(class_dir: str, image_dims: int = IMAGE_DIMS
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Read {i}.jpg/{i}.png pairs; skip wrong-sized samples (converter
    parity: fss_1000_image_to_tfrecord.py image_to_feature)."""
    images, masks = [], []
    jpgs = sorted(glob.glob(os.path.join(class_dir, "*.jpg")),
                  key=lambda p: os.path.basename(p))
    for jpg in jpgs:
        stem = os.path.splitext(os.path.basename(jpg))[0]
        png = os.path.join(class_dir, stem + ".png")
        if not os.path.exists(png):
            continue
        img = _read_image(jpg)
        msk = _read_image(png)
        if img is None or msk is None:
            continue
        if img.shape[0] != image_dims or img.shape[1] != image_dims:
            print("{} is not of expected image dimensions. "
                  "Skipping this sample".format(jpg))
            continue
        if msk.ndim > 2:
            msk = msk[:, :, 0]
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        images.append(img[:, :, :3].astype(np.uint8))
        masks.append(msk.astype(np.uint8))
    if not images:
        return (np.zeros((0, image_dims, image_dims, 3), np.uint8),
                np.zeros((0, image_dims, image_dims), np.uint8))
    return np.stack(images), np.stack(masks)


def _convert_one(job) -> Optional[str]:
    class_dir, out_dir, fmt, image_dims = job
    name = os.path.basename(class_dir.rstrip("/"))
    images, masks = load_class_dir(class_dir, image_dims)
    if images.shape[0] == 0:
        print("No valid samples in {}; skipping shard.".format(class_dir))
        return None
    if fmt == "tfrecord":
        out_path = os.path.join(out_dir, name + ".tfrecord.gzip")
        # C++ writer when built (native/tfrecord_loader.cc), Python codec
        # fallback — identical reference-format output either way.
        from mliis_tpu.data import native_loader
        native_loader.write_shard(out_path, images, masks)
    else:
        out_path = os.path.join(out_dir, name + ".npz")
        np.savez_compressed(out_path, images=images, masks=masks)
    return out_path


def convert_fss_1000(fss_root: str, out_dir: str, fmt: str = "tfrecord",
                     image_dims: int = IMAGE_DIMS,
                     num_workers: int = 8) -> List[str]:
    """Convert every class directory under `fss_root` into one shard."""
    assert fmt in ("tfrecord", "npz")
    os.makedirs(out_dir, exist_ok=True)
    class_dirs = sorted(d for d in glob.glob(os.path.join(fss_root, "*"))
                        if os.path.isdir(d))
    jobs = [(d, out_dir, fmt, image_dims) for d in class_dirs]
    if num_workers > 1 and len(jobs) > 1:
        with Pool(min(num_workers, 8)) as pool:
            results = pool.map(_convert_one, jobs)
    else:
        results = [_convert_one(j) for j in jobs]
    written = [r for r in results if r]
    print("Wrote {} shards to {}".format(len(written), out_dir))
    return written


def convert_fss_1000_joint(fss_root: str, out_dir: str,
                           num_val_tasks: int = 0,
                           fp_k_test_set: bool = False,
                           examples_per_shard: int = 200,
                           image_dims: int = IMAGE_DIMS,
                           num_workers: int = 8) -> List[str]:
    """Joint-training shards: class-level train/val/test splits with
    round-robin example sharding (fss_1000_image_to_joint_tfrecord_shards.py
    semantics: test classes from the canonical or FP-k manifest, val classes
    popped off the sorted remainder, ~200 examples per shard, multiprocess
    writes).

    TPU-native format difference: masks are stored as single-channel uint8
    CLASS-INDEX maps (0 = background) instead of the reference's dense
    (n_classes+1)-channel one-hot shards — the joint trainer one-hots
    lazily on-device, so dense shards would only waste ~1000x the bytes.
    """
    from mliis_tpu.data import manifests

    os.makedirs(out_dir, exist_ok=True)
    class_dirs = sorted(d for d in glob.glob(os.path.join(fss_root, "*"))
                        if os.path.isdir(d))
    all_classes = sorted(os.path.basename(d) for d in class_dirs)
    test_ids = set(manifests.FP_K_TEST_TASK_IDS if fp_k_test_set
                   else manifests.TEST_TASK_IDS)
    train_classes = [c for c in all_classes if c not in test_ids]
    test_classes = [c for c in all_classes if c in test_ids]
    train_classes, val_classes = manifests.split_train_test_tasks(
        train_classes, num_val_tasks, reproducible_splits=True)
    class_to_id = {c: i + 1 for i, c in enumerate(all_classes)}

    written = []
    for set_name, classes in (("train", train_classes), ("val", val_classes),
                              ("test", test_classes)):
        if not classes:
            continue
        all_images, all_labels = [], []
        for class_name in classes:
            images, masks = load_class_dir(os.path.join(fss_root, class_name),
                                           image_dims)
            if images.shape[0] == 0:
                continue
            class_id = class_to_id[class_name]
            all_images.append(images)
            # uint16: FSS-1000 class ids run to 1000, past uint8's range
            # (numpy>=2 raises OverflowError on the scalar cast).
            all_labels.append((masks > 127).astype(np.uint16)
                              * np.uint16(class_id))
        if not all_images:
            continue
        images = np.concatenate(all_images)
        labels = np.concatenate(all_labels)
        # Round-robin example sharding.
        num_shards = max(1, -(-images.shape[0] // examples_per_shard))
        shard_args = []
        for s in range(num_shards):
            sel = np.arange(s, images.shape[0], num_shards)
            path = os.path.join(out_dir, "{}_{:03d}.tfrecord.gzip".format(
                set_name, s))
            shard_args.append((path, images[sel], labels[sel]))
        if num_workers > 1 and len(shard_args) > 1:
            with Pool(min(num_workers, 8)) as pool:
                pool.starmap(tfrecord.write_segmentation_shard, shard_args)
        else:
            for sargs in shard_args:
                tfrecord.write_segmentation_shard(*sargs)
        written.extend(a[0] for a in shard_args)
    # Persist the class list so readers recover stable class ids.
    with open(os.path.join(out_dir, "classes.txt"), "w") as f:
        f.write("\n".join(all_classes) + "\n")
    print("Wrote {} joint shards to {}".format(len(written), out_dir))
    return written


def load_joint_shards(shard_dir: str, split: str, image_dims: int = IMAGE_DIMS):
    """Read joint shards of one split -> (images u8, labels u16 class-index
    maps, class list). The consumption path of the reference's shard-based
    joint workflow (joint_train/data/input_fn.py:23-133): the joint CLI
    builds its JointDataset from these via --joint_shard_dir."""
    paths = sorted(glob.glob(os.path.join(
        shard_dir, "{}_*.tfrecord*".format(split))))
    images, labels = [], []
    for path in paths:
        imgs, lbls = tfrecord.read_segmentation_shard(path, image_dims)
        images.append(imgs)
        labels.append(lbls)
    with open(os.path.join(shard_dir, "classes.txt")) as f:
        class_names = [line.strip() for line in f if line.strip()]
    if not images:
        return (np.zeros((0, image_dims, image_dims, 3), np.uint8),
                np.zeros((0, image_dims, image_dims), np.uint16), class_names)
    return np.concatenate(images), np.concatenate(labels), class_names


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        description="Convert FSS-1000 image dirs to task shards.")
    parser.add_argument("--fss_root", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--format", default="tfrecord",
                        choices=["tfrecord", "npz"])
    parser.add_argument("--image_dims", type=int, default=IMAGE_DIMS)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--joint", action="store_true",
                        help="Write joint-training split shards instead of "
                             "per-task shards.")
    parser.add_argument("--num_val_tasks", type=int, default=0)
    parser.add_argument("--fp_k_test_set", action="store_true")
    args = parser.parse_args(argv)
    if args.joint:
        convert_fss_1000_joint(args.fss_root, args.out_dir,
                               num_val_tasks=args.num_val_tasks,
                               fp_k_test_set=args.fp_k_test_set,
                               image_dims=args.image_dims,
                               num_workers=args.num_workers)
    else:
        convert_fss_1000(args.fss_root, args.out_dir, args.format,
                         args.image_dims, args.num_workers)


if __name__ == "__main__":
    main()
