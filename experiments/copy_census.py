"""Copy census of an optimized-HLO dump: bucket every `copy` instruction by
result shape+layout and source op_name metadata.

The chained-step trace attributes ~22% of device time to copy/copy-done
(docs/PERF_NOTES.md) — XLA's conv-backward layout choices. This script
answers WHICH tensors get copied and on behalf of which JAX source ops, so
the conv-layout lever (VERDICT round-3 item 3) is driven by data instead of
guesswork.

Usage: python experiments/copy_census.py /tmp/chained_hlo.txt
(the dump is produced by the measurement session's
`jit(...).lower(...).compile().as_text()` — see /tmp/tpu_session1.py F).
"""
import collections
import re
import sys


# %copy.123 = bf16[8,14,14,672]{2,1,3,0:T(8,128)(2,1)} copy(%fusion.4), ...
COPY_RE = re.compile(
    r"%?([\w.-]+)\s*=\s*([a-z0-9]+)\[([\d,]*)\]"
    r"(\{[^}]*\})?\s+copy\(")
META_RE = re.compile(r'metadata=\{op_name="([^"]*)"')


def dtype_bytes(dt: str) -> int:
    return {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "s8": 1,
            "u8": 1, "pred": 1, "c64": 8, "f64": 8, "s64": 8}.get(dt, 4)


def main(path):
    by_shape = collections.Counter()      # bytes per (dtype, shape, layout)
    by_source = collections.Counter()     # bytes per op_name prefix
    count = collections.Counter()
    total_bytes = 0
    n = 0
    with open(path) as f:
        for line in f:
            if " copy(" not in line and " copy-start(" not in line:
                continue
            m = COPY_RE.search(line.replace(" copy-start(", " copy("))
            if not m:
                continue
            _, dt, dims, layout = m.groups()
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            nbytes = elems * dtype_bytes(dt)
            shape_key = "{}[{}]{}".format(dt, dims, layout or "")
            by_shape[shape_key] += nbytes
            count[shape_key] += 1
            mm = META_RE.search(line)
            src = mm.group(1) if mm else "?"
            # compress: keep the tail of the op_name path (the JAX source op)
            src = re.sub(r"jit\([\w_]+\)/", "", src)
            src = "/".join(src.split("/")[-3:])[:110]
            by_source[src] += nbytes
            total_bytes += nbytes
            n += 1

    print("{} copy instructions, {:.1f} MB total result bytes".format(
        n, total_bytes / 1e6))
    print("\n== by result shape+layout (top 25) ==")
    for k, b in by_shape.most_common(25):
        print("{:9.2f} MB x{:<4} {}".format(b / 1e6, count[k], k))
    print("\n== by source op_name (top 25) ==")
    for k, b in by_source.most_common(25):
        print("{:9.2f} MB  {}".format(b / 1e6, k))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/chained_hlo.txt")
