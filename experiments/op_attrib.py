"""Attribute device time to individual XLA ops, then look up each hot op's
JAX-source metadata in the dumped HLO."""
import collections
import glob
import gzip
import json
import re
import sys


def main(trace_dir, hlo_path):
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    totals = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_names.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        totals[e["name"]] += e.get("dur", 0)
    grand = sum(totals.values())
    print("total op us:", grand)

    meta = {}
    op_re = re.compile(r"%([\w.-]+) = .*metadata=\{op_name=\"([^\"]*)\"")
    with open(hlo_path) as f:
        for line in f:
            m = op_re.search(line)
            if m:
                meta.setdefault(m.group(1), m.group(2))

    for name, dur in totals.most_common(40):
        src = meta.get(name, "?")
        # compress long op_name paths
        src = re.sub(r"jit\(group_step\)/", "", src)[:150]
        print("{:6.2%} {:>10.1f} ms  {:<40} {}".format(
            dur / grand, dur / 1e3, name[:40], src))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/g1_trace",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/g1_hlo.txt")
