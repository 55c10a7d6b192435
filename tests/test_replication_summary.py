"""Contract test for experiments/curve_replication_summary.py: the tool
aggregates the committed per-seed disjoint-family results into the one
cross-seed evidence JSON cited by docs/TPU_TRAINING_CURVE.md v4, so its
output schema (and agreement with the committed summary) is pinned here."""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(__file__))
TOOL = os.path.join(ROOT, "experiments", "curve_replication_summary.py")
# Every committed replication run dir (curve_v2_r4 = seed 0, curve_v2_seedN).
RESULTS = sorted(
    os.path.join(ROOT, "experiments", d, "result.json")
    for d in os.listdir(os.path.join(ROOT, "experiments"))
    if d.startswith("curve_v2")
    and os.path.exists(os.path.join(ROOT, "experiments", d, "result.json")))
COMMITTED = os.path.join(ROOT, "experiments",
                         "curve_replication_summary.json")


@pytest.mark.skipif(len(RESULTS) < 2,
                    reason="committed curve artifacts not present")
def test_summary_matches_committed_artifacts(tmp_path):
    out_path = tmp_path / "summary.json"
    proc = subprocess.run(
        [sys.executable, TOOL, *RESULTS, "--out", str(out_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        timeout=60)
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(out_path.read_text())

    assert got["n_seeds"] == len(RESULTS)
    seeds = [row["seed"] for row in got["per_seed"]]
    assert len(set(seeds)) == len(seeds), "duplicate seeds aggregated"
    for row in got["per_seed"]:
        # Every seed's evidence must be the full recipe with a clustered CI
        # that individually excludes zero.
        assert row["meta_iters"] == 3000
        assert row["n_tasks"] == 12
        assert row["task_level_diff_mean"] - row["task_level_ci95_t"] > 0
        assert row["ci_excludes_zero"]
    assert got["all_seeds_ci_exclude_zero"]
    assert got["final_iou_min"] <= got["final_iou_max"]

    # Every seed the committed summary CLAIMS must match a committed
    # per-seed artifact (a run dir newer than the summary is allowed — the
    # summary is regenerated when a run completes).
    if os.path.exists(COMMITTED):
        committed = json.loads(open(COMMITTED).read())
        got_rows = {r["seed"]: r for r in got["per_seed"]}
        for row in committed["per_seed"]:
            assert row["seed"] in got_rows, \
                f"summary cites seed {row['seed']} with no committed run dir"
            assert row["final_mean_iou"] == \
                got_rows[row["seed"]]["final_mean_iou"]
