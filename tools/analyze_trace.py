"""Summarize a jax.profiler trace: per-op device time rollup.

Reads the ``*.xplane.pb`` the profiler writes under
<dir>/plugins/profile/<run>/ and aggregates XLA op durations on the TPU
device lines — the \"where does the decode step go\" view used for the
VERDICT r3 headline-recovery analysis (SPTPU_BENCH_PROFILE=<dir> bench.py
writes a trace of the measured decode region).

Usage: python tools/analyze_trace.py <profile_dir> [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(root: str):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(root, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        yield p, xs


def _category(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas kernel"
    if re.search(r"\bfusion\b", n):
        return "fusion"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if any(c in n for c in ("all-reduce", "all-gather", "reduce-scatter",
                            "collective", "send", "recv")):
        return "collective"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "dynamic-update-slice" in n or "scatter" in n:
        return "scatter"
    if "gather" in n or "dynamic-slice" in n:
        return "gather"
    if "infeed" in n or "outfeed" in n:
        return "host transfer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line-filter", default="",
                    help="only lines whose name contains this")
    args = ap.parse_args()

    per_op = collections.Counter()
    per_cat = collections.Counter()
    n_op = collections.Counter()
    total_span = 0.0
    for path, xs in load_xspaces(args.dir):
        for plane in xs.planes:
            pname = plane.name.lower()
            if "tpu" not in pname and "device" not in pname:
                continue
            evmeta = plane.event_metadata
            for line in plane.lines:
                if args.line_filter and args.line_filter not in line.name:
                    continue
                lo = hi = None
                for ev in line.events:
                    meta = evmeta.get(ev.metadata_id)
                    name = meta.name if meta else str(ev.metadata_id)
                    dur = ev.duration_ps / 1e6  # ps -> us
                    per_op[name] += dur
                    n_op[name] += 1
                    per_cat[_category(name)] += dur
                    t0 = ev.offset_ps
                    lo = t0 if lo is None else min(lo, t0)
                    hi = (
                        t0 + ev.duration_ps
                        if hi is None
                        else max(hi, t0 + ev.duration_ps)
                    )
                if lo is not None:
                    total_span = max(total_span, (hi - lo) / 1e6)

    busy = sum(per_cat.values())
    print(f"device busy time: {busy / 1e3:.3f} ms over a "
          f"{total_span / 1e3:.3f} ms span "
          f"({100 * busy / max(total_span, 1e-9):.1f}% occupancy)")
    print("\nby category:")
    for cat, us in per_cat.most_common():
        print(f"  {cat:18s} {us / 1e3:9.3f} ms  {100 * us / busy:5.1f}%")
    print(f"\ntop {args.top} ops (total | count | mean):")
    for name, us in per_op.most_common(args.top):
        n = n_op[name]
        print(
            f"  {us / 1e3:9.3f} ms  x{n:<6d} {us / n:8.1f} us  {name[:110]}"
        )


if __name__ == "__main__":
    main()
