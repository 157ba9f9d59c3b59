"""Summarize a jax.profiler xplane trace: per-op device time, grouped.

Reads the newest .xplane.pb under the given directory, walks the TPU device
plane's "XLA Ops" line, and prints the top ops by total self time plus a
grouped rollup (by a coarse name bucket). This is the op-level breakdown tool
used for the perf tables in docs/ (profiling recipe from round 2).

Usage: python -m tpu3d.tools.parse_xplane <trace_dir> [--top 30] [--like rpn]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
from collections import defaultdict


def find_xplane(root: str) -> str:
    cands = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not cands:
        raise FileNotFoundError(f"no .xplane.pb under {root}")
    return max(cands, key=os.path.getmtime)


def load_device_ops(path: str, device_substr: str = "TPU"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    out = []  # (op_name, total_ps, count)
    for plane in xs.planes:
        if device_substr not in plane.name or "SparseCore" in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0, 0])
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
            for name, (ps, cnt) in agg.items():
                out.append((plane.name, name, ps, cnt))
    return out


_BUCKETS = [
    ("fusion", re.compile(r"^(loop_|input_)?fusion")),
    ("custom-call(pallas)", re.compile(r"custom-call|tpu_custom_call")),
    ("convolution/dot", re.compile(r"convolution|dot")),
    ("sort", re.compile(r"sort")),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice|dynamic-update")),
    ("reduce", re.compile(r"reduce")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape")),
    ("all-reduce/collective", re.compile(r"all-|collective|permute")),
]


def bucket(name: str) -> str:
    base = name.split(".")[0]
    for label, pat in _BUCKETS:
        if pat.search(base):
            return label
    return base


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--like", default=None,
                    help="only ops whose name contains this substring")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of profiled steps (divides totals)")
    args = ap.parse_args(argv)

    path = find_xplane(args.trace_dir)
    print(f"# {path}")
    ops = load_device_ops(path)
    if not ops:
        print("no TPU device plane / XLA Ops line found")
        return
    if args.like:
        ops = [o for o in ops if args.like in o[1]]
    total_ms = sum(o[2] for o in ops) / 1e9 / args.steps
    print(f"total device time: {total_ms:.2f} ms/step over {args.steps} steps")

    print(f"\n## top {args.top} ops by self time")
    for plane, name, ps, cnt in sorted(ops, key=lambda o: -o[2])[: args.top]:
        ms = ps / 1e9 / args.steps
        print(f"{ms:8.3f} ms  x{cnt:<4d} {name[:110]}")

    print("\n## grouped")
    groups = defaultdict(float)
    for _, name, ps, cnt in ops:
        groups[bucket(name)] += ps / 1e9 / args.steps
    for name, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
