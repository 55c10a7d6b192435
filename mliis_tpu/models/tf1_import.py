"""TF1 checkpoint name mapping for EfficientLab weights.

The published FOMAML* checkpoint stores TF1 variables under scopes like

  efficientnet-b0/stem/conv2d/kernel
  efficientnet-b0/blocks_3/conv2d/kernel            (expand conv)
  efficientnet-b0/blocks_3/depthwise_conv2d/depthwise_kernel
  efficientnet-b0/blocks_3/se/conv2d/{kernel,bias}  (se_reduce)
  efficientnet-b0/blocks_3/se/conv2d_1/{kernel,bias}(se_expand)
  efficientnet-b0/blocks_3/tpu_batch_normalization{,_1,_2}/{gamma,beta,
      moving_mean,moving_variance}
  decode/decode_skip_connections_{i}/conv2d{,_1,_2,_3}/{kernel,bias}
  decode/decode_skip_connections_{i}/batch_normalization{,_1,_2,_3}/...
  decode/final_layer_weights/{kernel,bias}

(scope structure per efficientnet_model.py:170-236,396-453 and
efficientlab.py:126-231). This module translates those names into the flax
pytree paths of models/efficientlab.py. TF conv kernels are HWIO like flax,
so no transposes; TF depthwise kernels [kh,kw,C,1] reshape to flax's
grouped-conv layout [kh,kw,1,C].

The environment ships no TF and the checkpoint blob is stripped, so the
mapper is validated structurally (tests construct synthetic TF-named dicts);
`load_tf1_checkpoint_vars` accepts an .npz conversion of the checkpoint
(name -> array) produced offline by any TF installation.
"""
import re
from typing import Dict, Optional

import numpy as np

_BN_SUFFIX = {"gamma": "scale", "beta": "bias", "moving_mean": "mean",
              "moving_variance": "var"}


def _bn_path(collection_params: bool) -> str:
    # gamma/beta live in params, moving stats in batch_stats.
    return "params/" if collection_params else "batch_stats/"


def _map_bn(prefix_out: str, bn_name: str, suffix: str) -> Optional[str]:
    if suffix not in _BN_SUFFIX:
        return None
    out_suffix = _BN_SUFFIX[suffix]
    collection = "params/" if suffix in ("gamma", "beta") else "batch_stats/"
    return "{}{}/{}/{}".format(collection, prefix_out, bn_name, out_suffix)


def map_tf1_name(tf_name: str,
                 backbone_scope: str = "efficientnet-b0") -> Optional[str]:
    """TF1 variable name -> "params/..."/"batch_stats/..." path, or None."""
    name = tf_name.split(":")[0]
    backbone_out = backbone_scope.replace("-", "_")

    # ---------------- backbone ----------------
    m = re.match(r"^{}/stem/conv2d(?:_\d+)?/kernel$".format(
        re.escape(backbone_scope)), name)
    if m:
        return "params/{}/stem_conv/kernel".format(backbone_out)
    m = re.match(r"^{}/stem/tpu_batch_normalization/(\w+)$".format(
        re.escape(backbone_scope)), name)
    if m:
        return _map_bn("{}".format(backbone_out), "stem_batch_normalization",
                       m.group(1))

    m = re.match(r"^{}/blocks_(\d+)/(.*)$".format(re.escape(backbone_scope)),
                 name)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        block = "{}/blocks_{}".format(backbone_out, idx)
        mm = re.match(r"^conv2d(?:_(\d+))?/kernel$", rest)
        if mm:
            # conv2d = expand (when the block has one) else project;
            # conv2d_1 = project when expand exists. Disambiguated by the
            # caller via shapes; default mapping assumes expand first.
            which = "expand_conv" if mm.group(1) is None else "project_conv"
            return "params/{}/{}/kernel".format(block, which)
        mm = re.match(r"^depthwise_conv2d/depthwise_kernel$", rest)
        if mm:
            return "params/{}/depthwise_conv/kernel".format(block)
        mm = re.match(r"^se/conv2d(?:_(\d+))?/(kernel|bias)$", rest)
        if mm:
            which = "se_reduce" if mm.group(1) is None else "se_expand"
            return "params/{}/{}/{}".format(block, which, mm.group(2))
        mm = re.match(r"^tpu_batch_normalization(?:_(\d+))?/(\w+)$", rest)
        if mm:
            n = mm.group(1)
            bn_name = "batch_normalization" + ("" if n is None
                                               else "_{}".format(n))
            return _map_bn(block, bn_name, mm.group(2))
        return None

    # ---------------- decoder ----------------
    m = re.match(r"^decode/decode_skip_connections_(\d+)/(.*)$", name)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        rsd = "decode_skip_connections_{}".format(idx)
        # conv2d creation order inside an RSD scope: [upsample_proj (only
        # when channel counts differ), branch_0, branch_1, fuse]
        # (efficientlab.py:204-230). Branch order is resolved by the caller
        # through `rsd_conv_order`; the default covers the common
        # no-upsample-proj case.
        mm = re.match(r"^conv2d(?:_(\d+))?/(kernel|bias)$", rest)
        if mm:
            order = ["branch_0", "branch_1", "fuse"]
            pos = 0 if mm.group(1) is None else int(mm.group(1))
            if pos >= len(order):
                return None
            return "params/{}/{}/conv/{}".format(rsd, order[pos], mm.group(2))
        mm = re.match(r"^batch_normalization(?:_(\d+))?/(\w+)$", rest)
        if mm:
            order = ["branch_0", "branch_1", "fuse"]
            pos = 0 if mm.group(1) is None else int(mm.group(1))
            if pos >= len(order):
                return None
            return _map_bn("{}/{}".format(rsd, order[pos]),
                           "batch_normalization", mm.group(2))
        return None

    m = re.match(r"^decode/final_layer_weights/(kernel|bias)$", name)
    if m:
        return "params/final_layer_weights/{}".format(m.group(1))
    return None


def convert_tf1_vars(tf_vars: Dict[str, np.ndarray],
                     backbone_scope: str = "efficientnet-b0",
                     rsd_has_upsample_proj: Dict[int, bool] = None
                     ) -> Dict[str, np.ndarray]:
    """Convert a {tf1_name: array} dict to {flax_path: array}.

    Handles the two order-dependent ambiguities:
      - blocks without an expand conv (expand_ratio == 1) name their project
        conv plain `conv2d`: resolved by kernel shape (1x1 in==out*ratio);
      - RSD modules with an upsample 1x1 projection shift the conv numbering
        by one: pass {reduction_index: True} in rsd_has_upsample_proj.
    """
    rsd_has_upsample_proj = rsd_has_upsample_proj or {}
    out = {}
    for tf_name, value in tf_vars.items():
        name = tf_name.split(":")[0]
        path = map_tf1_name(name, backbone_scope)
        if path is None:
            continue
        # Fix RSD conv numbering when an upsample projection exists.
        m = re.match(r"^decode/decode_skip_connections_(\d+)/"
                     r"(conv2d|batch_normalization)(?:_(\d+))?/", name)
        if m and rsd_has_upsample_proj.get(int(m.group(1)), False):
            pos = 0 if m.group(3) is None else int(m.group(3))
            order = ["upsample_proj", "branch_0", "branch_1", "fuse"]
            if pos < len(order):
                rsd = "decode_skip_connections_{}".format(m.group(1))
                leaf = path.rsplit("/", 1)[1]
                collection = path.split("/", 1)[0]
                if m.group(2) == "conv2d":
                    path = "{}/{}/{}/conv/{}".format(collection, rsd,
                                                     order[pos], leaf)
                else:
                    path = "{}/{}/{}/batch_normalization/{}".format(
                        collection, rsd, order[pos], leaf)
            else:
                continue
        # Blocks whose only conv2d is the project conv (expand_ratio == 1):
        # a 1x1 kernel mapped to expand_conv that doesn't widen channels is
        # actually the project conv.
        m = re.match(r"^params/(.*)/expand_conv/kernel$", path)
        if m and value.ndim == 4 and value.shape[0] == 1 \
                and value.shape[3] <= value.shape[2]:
            path = "params/{}/project_conv/kernel".format(m.group(1))
        # TF depthwise kernels are [kh, kw, C, multiplier]; flax grouped
        # convs use [kh, kw, 1, C].
        if path.endswith("depthwise_conv/kernel") and value.ndim == 4 \
                and value.shape[3] == 1:
            value = np.transpose(value, (0, 1, 3, 2))
        out[path] = value
    return out


def load_tf1_checkpoint_vars(npz_path: str) -> Dict[str, np.ndarray]:
    """Load an offline-converted {tf_name: array} npz."""
    with np.load(npz_path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
