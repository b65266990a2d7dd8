"""Summarize a jax.profiler trace without tensorboard.

Usage: python scripts/perf/parse_xplane.py /tmp/cnx_trace [top_n]

Sums synchronous TensorCore op durations from the "XLA Ops" line of the
/device:TPU:0 plane, grouped by a coarse bucket of the op name. The "Async
XLA Ops" line spans async windows and must not be summed (CLAUDE.md recipe).
"""

import glob
import re
import sys
from collections import defaultdict


def bucket(name: str) -> str:
    # Use only the instruction name left of " = " — the full text includes
    # operand names (copy-done, convert_element_type...) that pollute matching.
    n = name.split(" = ")[0].lower()
    kind = name.split(" = ")[1].split("(")[0] if " = " in name else ""
    if re.match(r"%fusion", n):
        # plain %fusion.N: look at the output kind + calls suffix
        m = re.search(r"calls=%(\S+)", name)
        callee = m.group(1).lower() if m else ""
        for pat, b in [("convolution", "conv_fusion"), ("dot", "gemm_fusion"),
                       ("copy", "copy_fusion"), ("transpose", "copy_fusion"),
                       ("reduce", "reduce_fusion"), ("convert", "convert_fusion")]:
            if pat in callee:
                return b
        return "fusion(gemm-like)"
    for pat, b in [
        (r"convolution", "conv"),
        (r"dot|gemm", "gemm"),
        (r"copy|pad|transpose|reshape|bitcast", "copy/pad"),
        (r"custom-call", "custom-call(pallas)"),
        (r"reduce", "reduce"),
        (r"convert", "convert"),
        (r"all-reduce|all-gather|collective", "collective"),
        (r"fusion", "named_fusion"),
    ]:
        if re.search(pat, n):
            return f"{b}" if pat != r"fusion" else n.split(".")[0].lstrip("%")
    return "other"


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op = defaultdict(float)
            per_bucket = defaultdict(float)
            total = 0.0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                dur_ms = ev.duration_ps / 1e9
                per_op[name] += dur_ms
                per_bucket[bucket(name)] += dur_ms
                total += dur_ms
            print(f"== plane {plane.name} | total sync op time {total:.1f} ms ==")
            print("-- buckets --")
            for b, ms in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
                print(f"  {b:24s} {ms:9.2f} ms  {100*ms/total:5.1f}%")
            print(f"-- top {top_n} ops --")
            for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"  {ms:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
