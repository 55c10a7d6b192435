"""In-suite numeric crosscheck vs the reference's own TF1 graph.

Runs experiments/tf1_numeric_crosscheck.py (subprocess: the script aliases
sys.modules["tensorflow"] to tf.compat.v1 while importing the reference, so
it must not share an interpreter with the suite). Pins the production TF1
import map (models/tf1_import.py) AND the flax model math against the
reference graph end-to-end: a wiring/normalization/BN regression that
preserves shapes would fail here at the 2e-4 probability threshold.

Reference graph under test: /root/reference/models/efficientlab.py:1-220.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "experiments", "tf1_numeric_crosscheck.py")


def _have_tf():
    try:
        import tensorflow  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not present")
@pytest.mark.skipif(not _have_tf(), reason="tensorflow not in environment")
def test_forward_matches_reference_tf1_graph(tmp_path):
    out = tmp_path / "crosscheck.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--image_size", "64", "--batch", "2",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, (
        "crosscheck failed:\n{}\n{}".format(proc.stdout[-3000:],
                                            proc.stderr[-3000:]))
    result = json.loads(out.read_text())
    assert result["passed"]
    assert result["max_abs_prob_diff"] <= result["threshold"]
    assert result["ce_dice_rel_diff"] <= 1e-5
