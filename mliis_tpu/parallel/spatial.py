"""Spatial partitioning: shard the image H axis across devices (GSPMD).

The reference has no sequence dimension; SURVEY.md §2.2/§5 identify image
resolution as this domain's long-context analogue. The TPU-native answer is
not hand-written halo exchange but GSPMD: annotate the input's H axis with a
mesh sharding and let XLA insert the halo collectives for every windowed op
(convolutions, pooling, resize) — the "pick a mesh, annotate shardings, let
XLA insert collectives" recipe. This turns per-device activation memory for
one image from O(H·W) to O(H/D·W), the lever for resolutions far above the
224px benchmark (a 2048px EfficientLab forward's activations exceed one
chip's HBM; sharded over 8 they fit).

Inference-path capability: BatchNorm here uses population statistics
(train=False), so no cross-shard moment question arises; outputs are
bit-equal to the unsharded forward up to XLA reduction order (tested on the
8-device CPU mesh, tests/test_parallel.py).
"""
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "sp"


def make_spatial_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (SPATIAL_AXIS,))


def make_spatial_forward(model, mesh: Mesh):
    """jit-compiled inference forward with images sharded over H.

    Returns forward(variables, images) -> probs where `images` is
    [N, H, W, 3] with H split across the mesh's "sp" axis (H need not
    divide the mesh evenly — GSPMD pads internally). Variables are
    replicated; XLA inserts halo exchanges for every conv/resize window
    that crosses a shard boundary.
    """
    image_sharding = NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))
    replicated = NamedSharding(mesh, P())

    def forward(variables, images):
        _, probs = model.apply(variables, images, train=False)
        return probs

    return jax.jit(forward,
                   in_shardings=(replicated, image_sharding),
                   out_shardings=image_sharding)


def shard_spatial(images, mesh: Mesh):
    """Place [N, H, W, C] images with H sharded over the mesh."""
    return jax.device_put(
        images, NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None)))
