"""Serving export: serialize a fine-tuned model to a StableHLO artifact.

The reference's deployment story ends at TF1 checkpoints
(/root/reference/utils/util.py:72-81 exports per-task fine-tuned
checkpoints that still need the full python graph-building stack to
serve). The TPU-native story: `jax.export` lowers the jitted inference
forward — with the adapted parameters baked in as constants — to a
versioned StableHLO artifact that any PJRT runtime (TPU serving binaries,
CPU, IFRT proxies) can load and execute without this package, python
model code, or flax installed.

Artifact layout: a single file; bytes are jax.export's serialization
(StableHLO + calling convention + jax version guards).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mliis_tpu.meta.inner_loop import ModelState


def export_serving_fn(model, state: ModelState, image_size: int,
                      batch_size: Optional[int] = None,
                      platforms: Tuple[str, ...] = ("cpu", "tpu")):
    """Build and serialize the inference forward (population BN statistics,
    no dropout — the reference's is_training=False predict mode).

    `batch_size=None` exports a polymorphic batch dimension (serve any
    batch size); a concrete int pins it (fastest, no shape recompilation
    in the serving runtime).

    Returns (serialized bytes, jax.export.Exported).
    """
    from jax import export as jax_export

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def forward(images):
        _, probs = model.apply(variables, images, train=False)
        return probs

    if batch_size is None:
        (batch,) = jax_export.symbolic_shape("batch")
        spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3),
                                    jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3),
                                    jnp.float32)
    exported = jax_export.export(jax.jit(forward),
                                 platforms=list(platforms))(spec)
    return exported.serialize(), exported


def save_serving_artifact(path: str, model, state: ModelState,
                          image_size: int,
                          batch_size: Optional[int] = None,
                          platforms: Tuple[str, ...] = ("cpu", "tpu")) -> str:
    data, _ = export_serving_fn(model, state, image_size,
                                batch_size=batch_size, platforms=platforms)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_serving_artifact(path: str):
    """Deserialize an artifact; returns the Exported (call via .call)."""
    from jax import export as jax_export
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
