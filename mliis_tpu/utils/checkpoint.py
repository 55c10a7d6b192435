"""Checkpointing: save/restore ModelState with the reference's lifecycle.

Replaces TF1 Saver semantics (train.py:129-131, utils/util.py:42-81):
periodic `model.ckpt-<step>` checkpoints with max_to_keep rotation, a
`checkpoint` index file recording the latest (relative-path parsing parity
with latest_checkpoint), best-seen-eval saving under `best_eval/`, per-task
fine-tuned exports, and scope-filtered restore (backbone-only /
everything-but-final-layer for head reshaping, efficientlab.py:398-443).

Format: one .npz of flattened "/"-joined pytree paths + a small JSON header.
A name-mapping hook supports importing weights converted from the published
TF1 checkpoint (var names like 'efficientnet-b0/blocks_0/conv2d/kernel').
"""
import json
import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mliis_tpu.meta.inner_loop import ModelState, OptState

Pytree = Any

CHECKPOINT_PREFIX = "model.ckpt"
INDEX_FILE = "checkpoint"


def flatten_tree(tree: Pytree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for entry in path:
            key = getattr(entry, "key", None)
            if key is None:
                key = getattr(entry, "idx", None)
            if key is None:
                key = getattr(entry, "name", str(entry))
            keys.append(str(key))
        out[prefix + "/".join(keys)] = np.asarray(leaf)
    return out


def unflatten_into(template: Pytree, flat: Dict[str, np.ndarray],
                   prefix: str = "", strict: bool = True) -> Pytree:
    """Fill `template`'s leaves from `flat` by path; missing keys keep the
    template's value when strict=False (scope-filtered restore)."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        keys = []
        for entry in path:
            key = getattr(entry, "key", None)
            if key is None:
                key = getattr(entry, "idx", None)
            if key is None:
                key = getattr(entry, "name", str(entry))
            keys.append(str(key))
        name = prefix + "/".join(keys)
        if name in flat:
            value = np.asarray(flat[name])
            # Shape mismatches are config errors in BOTH modes: silently
            # inserting a wrong-shaped leaf would surface later as an
            # opaque error deep inside jit (or broadcast wrongly).
            if value.shape != np.shape(leaf):
                raise ValueError("Shape mismatch for {}: ckpt {} vs model {}"
                                 .format(name, value.shape, np.shape(leaf)))
            leaves.append(jnp.asarray(value))
        elif strict:
            raise KeyError("Missing checkpoint entry: {}".format(name))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(save_dir: str, state: ModelState, step: int,
                    max_to_keep: int = 2,
                    metadata: Optional[Dict] = None) -> str:
    os.makedirs(save_dir, exist_ok=True)
    flat = {}
    flat.update(flatten_tree(state.params, "params/"))
    flat.update(flatten_tree(state.batch_stats, "batch_stats/"))
    flat.update(flatten_tree(state.opt.v, "opt_v/"))
    flat["opt_step"] = np.asarray(state.opt.step)
    path = os.path.join(save_dir, "{}-{}.npz".format(CHECKPOINT_PREFIX, step))
    np.savez(path, **flat)
    meta = dict(metadata or {})
    meta["step"] = step
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    # Index file: first line points at the latest checkpoint (the format
    # latest_checkpoint parses, utils/util.py:42-50).
    with open(os.path.join(save_dir, INDEX_FILE), "w") as f:
        f.write('model_checkpoint_path: "{}-{}"\n'.format(
            CHECKPOINT_PREFIX, step))
    _rotate(save_dir, max_to_keep)
    return path


def _checkpoint_steps(save_dir: str) -> List[int]:
    pattern = re.compile(re.escape(CHECKPOINT_PREFIX) + r"-(\d+)\.npz$")
    steps = []
    for name in os.listdir(save_dir):
        m = pattern.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def _rotate(save_dir: str, max_to_keep: int) -> None:
    steps = _checkpoint_steps(save_dir)
    for step in steps[:-max_to_keep]:
        base = os.path.join(save_dir,
                            "{}-{}.npz".format(CHECKPOINT_PREFIX, step))
        for p in (base, base + ".json"):
            if os.path.exists(p):
                os.remove(p)


def latest_checkpoint(checkpoint_dir: str,
                      ckpt_prefix: str = CHECKPOINT_PREFIX,
                      return_relative: bool = True) -> str:
    """Resolve the newest checkpoint path via the index file (parses the
    basename out of the index so moved directories still restore —
    utils/util.py:42-50)."""
    index_path = os.path.join(checkpoint_dir, INDEX_FILE)
    if os.path.exists(index_path):
        with open(index_path) as f:
            text = f.readline()
        pattern = re.compile(re.escape(ckpt_prefix + "-") + r"[0-9]+")
        found = pattern.findall(text)
        if found:
            return os.path.join(checkpoint_dir, found[0] + ".npz")
    steps = _checkpoint_steps(checkpoint_dir)
    if not steps:
        raise FileNotFoundError(
            "No checkpoints in {}".format(checkpoint_dir))
    return os.path.join(checkpoint_dir,
                        "{}-{}.npz".format(ckpt_prefix, steps[-1]))


def restore_checkpoint(path_or_dir: str, template: ModelState,
                       filter_to_scopes: Optional[List[str]] = None,
                       filter_out_scope: Optional[str] = None
                       ) -> Tuple[ModelState, Dict]:
    """Load a checkpoint into the shape of `template`.

    filter_to_scopes / filter_out_scope operate on "params/..." paths, the
    functional analogue of the reference's var-name scope filters (restore
    backbone only; skip final-layer weights when reshaping the head).
    Filtered-out (or missing) entries keep the template's values.
    """
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = latest_checkpoint(path_or_dir)
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}

    if filter_to_scopes is not None or filter_out_scope is not None:
        # Scope filters cover every variable collection sharing the module
        # path (params, BN running stats, optimizer slots) — the reference's
        # TF var-scope filter caught moving stats inside the scope too
        # (efficientlab.py:425-433); a backbone-only restore must not leak
        # decoder BN stats from the checkpoint.
        def keep(name: str) -> bool:
            for col in ("params/", "batch_stats/", "opt_v/"):
                if name.startswith(col):
                    rel = name[len(col):]
                    if filter_out_scope and rel.startswith(filter_out_scope):
                        return False
                    if filter_to_scopes is not None:
                        return any(rel.startswith(s)
                                   for s in filter_to_scopes)
                    return True
            return True
        flat = {k: v for k, v in flat.items() if keep(k)}

    strict = filter_to_scopes is None and filter_out_scope is None
    params = unflatten_into(template.params, flat, "params/", strict=strict)
    batch_stats = unflatten_into(template.batch_stats, flat, "batch_stats/",
                                 strict=strict)
    opt_v = unflatten_into(template.opt.v, flat, "opt_v/", strict=False)
    opt_step = jnp.asarray(flat.get("opt_step", np.zeros((), np.int32)))
    meta = {}
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return ModelState(params, batch_stats,
                      OptState(step=opt_step, v=opt_v)), meta


def save_fine_tuned_checkpoint(save_dir: str, state: ModelState,
                               step: Optional[int] = None,
                               eval_sample_num: Optional[int] = None) -> str:
    """Per-task fine-tuned export keyed by eval sample (util.py:72-81)."""
    if eval_sample_num is not None:
        save_dir = os.path.join(save_dir, str(eval_sample_num))
    return save_checkpoint(save_dir, state, step or 0, max_to_keep=1)


def import_tf1_var_map(tf_vars: Dict[str, np.ndarray],
                       template: ModelState,
                       name_mapper: Callable[[str], Optional[str]]
                       ) -> ModelState:
    """Import a {tf1_var_name: array} dict (e.g. converted offline from the
    published FOMAML* checkpoint) into a ModelState. `name_mapper` translates
    TF names to "params/..."/"batch_stats/..." paths; returning None skips a
    variable. TF conv kernels are [kh,kw,in,out] like flax — no transpose."""
    flat: Dict[str, np.ndarray] = {}
    for tf_name, value in tf_vars.items():
        new_name = name_mapper(tf_name)
        if new_name is not None:
            flat[new_name] = value
    params = unflatten_into(template.params, flat, "params/", strict=False)
    batch_stats = unflatten_into(template.batch_stats, flat, "batch_stats/",
                                 strict=False)
    return ModelState(params, batch_stats, template.opt)
