"""Real-chip detector profile: device time per detection stage (xprof).

Runs detect_batch on the demo photos under jax.profiler.trace and parses
the trace's device events, attributing time to the named_scope stages in
detect_batch (threshold / ccl / topk / extract / refine / decode).  Host
wall timing of single dispatches is meaningless through the ~25 ms tunnel;
the trace's device-side durations are the truth (CLAUDE.md).

Usage: python tools/detect_profile.py [--out /tmp/arslam_xprof]
Prints a per-stage table (stderr) + one JSON line (stdout).  The committed
summary lives in docs/detection.md.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def parse_trace(trace_dir: str) -> dict:
    """Aggregate device op durations by detect stage scope.

    Leaf ops live on the device pid's "XLA Ops" thread; each carries the
    jax named_scope path in args.tf_op (e.g.
    ``jit(detect_batch)/detect_ccl_w13/...``).  Whole-program time comes
    from the "XLA Modules" thread (one event per dispatch) — summing leaf
    ops would double-count while-loop iterations vs async overlap.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids, op_tracks, module_tracks = set(), set(), set()
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name" and (
                "TPU" in name or "/device:" in name):
            dev_pids.add(e["pid"])
    for e in events:
        if e.get("ph") != "M" or e.get("name") != "thread_name":
            continue
        if e["pid"] not in dev_pids:
            continue
        tname = e.get("args", {}).get("name", "")
        if tname == "XLA Ops":
            op_tracks.add((e["pid"], e.get("tid")))
        elif tname == "XLA Modules":
            module_tracks.add((e["pid"], e.get("tid")))
    per_stage = defaultdict(float)
    module_us, n_dispatch = 0.0, 0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        dur = float(e.get("dur", 0.0))  # microseconds
        if key in module_tracks:
            module_us += dur
            n_dispatch += 1
            continue
        if key not in op_tracks:
            continue
        tf_op = e.get("args", {}).get("tf_op", "")
        # while.N wrapper events nest over their per-iteration leaf ops
        # (which carry the tf_op scopes) — counting both double-counts
        if not tf_op and e.get("name", "").startswith("while"):
            continue
        stage = "other"
        for part in tf_op.split("/"):
            if part.startswith("detect_"):
                stage = part[len("detect_"):].split("_w")[0]
                # decode scopes are detect_decode_<dict>
                stage = stage.split("_")[0] if stage.startswith(
                    "decode") else stage
                break
            if part.startswith("vmap(detect_"):
                stage = part[len("vmap(detect_"):].rstrip(")").split("_")[0]
                break
        per_stage[stage] += dur
    return {"per_stage_us": dict(per_stage),
            "ops_total_us": sum(per_stage.values()),
            "module_us": module_us, "n_dispatch": n_dispatch}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/arslam_xprof")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    from PIL import Image

    from ar_slam_tpu.cli import _enable_compile_cache
    from ar_slam_tpu.config import ArSlamConfig
    from ar_slam_tpu.detect.tpu_detect import DetectParams, detect_batch

    _enable_compile_cache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = yaml.safe_load(open(os.path.join(
        repo, "tests", "fixtures", "demo_detections.yaml")))
    imgs = np.stack([np.asarray(Image.open(c["img_fn"]).convert("L"))
                     for c in data["captures"]])
    reps_needed = (args.batch + len(imgs) - 1) // len(imgs)
    batch = jnp.asarray(np.concatenate([imgs] * reps_needed)[:args.batch])
    dcfg = ArSlamConfig().detect
    params = DetectParams(win_sizes=tuple(dcfg.adaptive_thresh_win_sizes),
                          max_candidates=dcfg.max_candidates)

    out = detect_batch(batch, params=params)
    jax.block_until_ready(out)  # compile outside the trace

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            out = detect_batch(batch, params=params)
            jax.block_until_ready(out)

    stats = parse_trace(args.out)
    per = stats["per_stage_us"]
    denom = args.reps * args.batch
    print(f"device time per frame (batch {args.batch}, {args.reps} reps, "
          f"windows {dcfg.adaptive_thresh_win_sizes}):", file=sys.stderr)
    for k in sorted(per, key=per.get, reverse=True):
        print(f"  {k:10s} {per[k] / denom:9.1f} us/frame "
              f"({100 * per[k] / max(stats['ops_total_us'], 1):5.1f} %)",
              file=sys.stderr)
    device_us_per_frame = stats["module_us"] / max(stats["n_dispatch"], 1) \
        / args.batch
    print(json.dumps({
        "device_us_per_frame": round(device_us_per_frame, 1),
        "device_frames_per_s": round(1e6 / device_us_per_frame, 1),
        "per_stage_us_per_frame": {
            k: round(v / denom, 1) for k, v in per.items()},
        "windows": list(dcfg.adaptive_thresh_win_sizes),
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
