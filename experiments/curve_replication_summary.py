"""Aggregate disjoint-family generalization runs across seeds.

Reads the result.json of each `tpu_curve_v2.py` run (independent seeds =
independent model init + train/test family draws + training key stream) and
emits one summary JSON: per-seed final held-out IoU, task-level paired gain
vs the random-init baseline with its clustered t-CI, and whether every seed
individually excludes zero. Stands next to docs/TPU_TRAINING_CURVE.md as
the replication evidence for the reference's run.sh -> ~0.87 north star
(/root/reference/run.sh:8-17) while the FSS-1000 blobs are stripped.

Usage:
    python experiments/curve_replication_summary.py \
        experiments/curve_v2_r4/result.json \
        experiments/curve_v2_seed1/result.json \
        --out experiments/curve_replication_summary.json
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", nargs="+", help="result.json paths, one per seed")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows = []
    for path in args.results:
        with open(path) as f:
            r = json.load(f)
        rows.append({
            "path": path,
            "seed": r.get("seed", 0),
            "meta_iters": r["meta_iters_done"],
            "baseline_mean_iou": round(r["baseline_mean_iou"], 4),
            "final_mean_iou": round(r["final_mean_iou"], 4),
            "task_level_diff_mean": round(r["task_level_diff_mean"], 4),
            "task_level_ci95_t": round(r["task_level_ci95_t"], 4),
            "ci_excludes_zero": r["task_level_ci_excludes_zero"],
            "n_tasks": r["n_tasks"],
        })

    finals = [r["final_mean_iou"] for r in rows]
    out = {
        "config": ("independent replications of the disjoint-family "
                   "FOMAML* generalization run (experiments/tpu_curve_v2.py "
                   "--seed N): fresh model init, fresh train AND held-out "
                   "task draws, fresh training keys per seed; within each "
                   "run the baseline/meta-init comparison is paired"),
        "n_seeds": len(rows),
        "per_seed": rows,
        "final_iou_min": round(min(finals), 4),
        "final_iou_max": round(max(finals), 4),
        "all_seeds_ci_exclude_zero": all(r["ci_excludes_zero"] for r in rows),
    }
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
