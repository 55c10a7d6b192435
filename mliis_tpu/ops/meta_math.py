"""Pytree arithmetic for meta-updates (Reptile / FOMAML outer steps).

On-device equivalents of the host-numpy variable-sequence math the reference
performs between `VariableState` export/import round-trips
(/root/reference/meta_learners/variables.py:9-55). Here model state is a JAX
pytree and every op is pure and jit/vmap-compatible, so outer updates fuse
into the same XLA program as the inner loops.
"""
from typing import Any, Sequence

import jax
import jax.numpy as jnp

Pytree = Any


def tree_interpolate(old: Pytree, new: Pytree, epsilon) -> Pytree:
    """old + epsilon * (new - old); the Reptile outer update."""
    return jax.tree_util.tree_map(lambda o, n: o + epsilon * (n - o), old, new)


def tree_average(trees: Sequence[Pytree]) -> Pytree:
    """Elementwise mean over a sequence of pytrees."""
    return jax.tree_util.tree_map(lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *trees)


def tree_mean_over_axis(tree: Pytree, axis: int = 0) -> Pytree:
    """Mean over a leading (e.g. vmapped meta-batch) axis of every leaf."""
    return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=axis), tree)


def tree_weighted_mean_over_axis(tree: Pytree, weights: jnp.ndarray, axis: int = 0) -> Pytree:
    """Weighted mean over `axis` of every leaf; used to mask padded
    meta-batch slots. All-zero weights return zeros (everything masked)
    rather than inf."""
    denom = jnp.maximum(jnp.sum(weights), jnp.finfo(jnp.float32).tiny)

    def _wmean(x):
        shape = [1] * x.ndim
        shape[axis] = weights.shape[0]
        return jnp.sum(x * weights.reshape(shape), axis=axis) / denom

    return jax.tree_util.tree_map(_wmean, tree)


def tree_sub(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_add(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def tree_scale(tree: Pytree, scale) -> Pytree:
    return jax.tree_util.tree_map(lambda x: x * scale, tree)


def tree_weight_decay(tree: Pytree, rate) -> Pytree:
    """Multiplicative weight decay, the reference's pre-step op
    (variables.py:48-55). rate=1 is the identity."""
    return tree_scale(tree, rate)


def tree_dot(a: Pytree, b: Pytree) -> jnp.ndarray:
    """Inner product over all leaves (useful for tests / diagnostics)."""
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(lambda acc, x: acc + x, leaves, jnp.float32(0))


def tree_count_params(tree: Pytree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
