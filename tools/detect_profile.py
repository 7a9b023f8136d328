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
    """Aggregate device-track event durations by detect stage scope."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" / "/device:"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower():
                dev_pids.add(e["pid"])
    per_stage = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "")
        args_name = e.get("args", {}).get("name", "") or e.get(
            "args", {}).get("long_name", "")
        blob = f"{name} {args_name}"
        total += dur
        stage = "other"
        for key in ("detect_threshold", "detect_ccl", "detect_topk",
                    "detect_extract", "detect_refine", "detect_decode"):
            if key in blob:
                stage = key.split("detect_")[1].split("_w")[0]
                if stage.startswith("decode"):
                    stage = "decode"
                stage = {"threshold": "threshold", "ccl": "ccl",
                         "topk": "topk", "extract": "extract",
                         "refine": "refine", "decode": "decode"}.get(
                    stage.split("_")[0], stage)
                break
        per_stage[stage] += dur
    return {"per_stage_us": dict(per_stage), "total_us": total}


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
              f"({100 * per[k] / max(stats['total_us'], 1):5.1f} %)",
              file=sys.stderr)
    device_us_per_frame = stats["total_us"] / denom
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
