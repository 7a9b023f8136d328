"""Generic xprof trace summarizer for device-side attribution.

Host wall timing of single dispatches through the ~25 ms tunnel is
meaningless (CLAUDE.md); the trace's device events are the truth.  This
module parses a jax.profiler.trace directory and aggregates the device
"XLA Ops" track by named_scope (tf_op path component), source line, or HLO
category.  ``while.N`` wrapper events (which nest over their per-iteration
leaf ops) are excluded to avoid double counting; whole-program time comes
from the "XLA Modules" track.

Usage: python tools/trace_summary.py TRACE_DIR [--by scope|source|category]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_device_events(trace_dir: str):
    """Returns (op_events, module_events) from the newest trace file."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                dev_pids.add(e["pid"])
    op_tracks, module_tracks = set(), set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in dev_pids):
            tname = e.get("args", {}).get("name", "")
            key = (e["pid"], e.get("tid"))
            if tname == "XLA Ops":
                op_tracks.add(key)
            elif tname == "XLA Modules":
                module_tracks.add(key)
    ops, modules = [], []
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in module_tracks:
            modules.append(e)
        elif key in op_tracks:
            # while wrappers nest over per-iteration leaf ops
            if (not e.get("args", {}).get("tf_op")
                    and e.get("name", "").startswith("while")):
                continue
            ops.append(e)
    return ops, modules


def aggregate(ops, by: str = "scope"):
    """Sum op durations (us) by the chosen key."""
    agg = defaultdict(float)
    for e in ops:
        args = e.get("args", {})
        if by == "scope":
            tf_op = args.get("tf_op", "")
            parts = [p for p in tf_op.split("/")
                     if not p.startswith(("jit(", "vmap(", "while", "body",
                                          "cond", "transpose("))]
            key = parts[0] if parts else (tf_op or e.get("name", "?"))
            key = key.split(":")[0]
        elif by == "source":
            src = args.get("source", "")
            key = src.replace("/root/repo/", "") or e.get("name", "?")
        elif by == "category":
            key = args.get("hlo_category", "?")
        else:
            raise ValueError(by)
        agg[key] += float(e.get("dur", 0.0))
    return dict(agg)


def summarize(trace_dir: str, by: str = "scope", top: int = 25,
              out=sys.stderr):
    ops, modules = load_device_events(trace_dir)
    agg = aggregate(ops, by)
    total = sum(agg.values())
    module_us = sum(float(e.get("dur", 0.0)) for e in modules)
    print(f"modules: {len(modules)} dispatches, "
          f"{module_us / 1e3:.1f} ms total device time", file=out)
    for k, v in sorted(agg.items(), key=lambda x: -x[1])[:top]:
        print(f"  {v / 1e3:9.2f} ms  {100 * v / max(total, 1):5.1f}%  {k}",
              file=out)
    return {"module_us": module_us, "n_dispatch": len(modules),
            "ops_total_us": total, "agg_us": agg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--by", choices=["scope", "source", "category"],
                    default="scope")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    stats = summarize(args.trace_dir, by=args.by, top=args.top)
    print(json.dumps({
        "module_ms": round(stats["module_us"] / 1e3, 2),
        "n_dispatch": stats["n_dispatch"],
    }))


if __name__ == "__main__":
    main()
