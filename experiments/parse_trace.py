"""Parse a jax.profiler trace: device-time share by XLA op category."""
import collections
import glob
import gzip
import json
import re
import sys


def main(trace_dir):
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    assert paths, "no trace files under " + trace_dir
    path = sorted(paths)[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # Find TPU device pids (process names containing TPU or device).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()}
    if not tpu_pids:
        print("process names:", pid_names)
        return
    totals = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)
        if re.match(r"^(jit_|while|\d+$)", name):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        totals[base] += dur
    total = sum(totals.values())
    print("total device us:", total)
    for name, dur in totals.most_common(25):
        print("{:6.2%}  {:>12} us  {}".format(dur / total, dur, name))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/planar_trace")
