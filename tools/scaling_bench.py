"""Distributed-BA scaling harness (BASELINE config #5).

Measures LM iterations/s of the sharded solver at several mesh sizes on
whatever devices exist (virtual CPU mesh in CI — structural validation;
real chips on a pod slice — the ICI scaling-efficiency number).

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--tags 500]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--tags", type=int, default=500)
    ap.add_argument("--caps", type=int, default=200)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh of this size")
    args = ap.parse_args()

    if args.cpu_mesh:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    sys.path.insert(0, ".")
    from bench import build_problem
    from ar_slam_tpu.parallel import block_mesh, lm_solve_dist
    from ar_slam_tpu.solve.lm import LMConfig

    n_dev = len(jax.devices())
    sizes = args.devices or sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    sizes = [s for s in sizes if s <= n_dev]
    print(f"devices available: {n_dev}; testing mesh sizes {sizes}",
          file=sys.stderr)
    if args.cpu_mesh:
        print(
            "NOTE: virtual CPU mesh — all shards share one host's cores, so "
            "iter/s CANNOT increase with mesh size; this validates "
            "structure/overhead only.  ICI efficiency needs real chips.",
            file=sys.stderr,
        )

    arrs, cap_poses, tag_poses = build_problem(args.tags, args.caps)
    config = LMConfig(max_iterations=args.iters, function_tolerance=0.0,
                      parameter_tolerance=0.0)

    results = {}
    for n in sizes:
        mesh = block_mesh(n)

        def run():
            return lm_solve_dist(
                mesh, arrs.camera.astype(np.float32), cap_poses, tag_poses,
                arrs.cap_idx, arrs.tag_idx, arrs.corners.astype(np.float32),
                arrs.block_mask, np.asarray(True), arrs.cap_mask,
                arrs.tag_mask, aruco_size=0.0635, config=config,
            )

        out = run()
        jax.block_until_ready(out[0])  # compile
        t0 = time.time()
        out = run()
        iters = int(out[3]["iterations"])
        wall = time.time() - t0
        ips = iters / wall
        results[n] = ips
        eff = ips / (results[sizes[0]] * n / sizes[0]) if n != sizes[0] else 1.0
        print(f"mesh={n}: {ips:.1f} iter/s  scaling_eff={eff:.2f}",
              file=sys.stderr)

    print(json.dumps({"mesh_iters_per_s": results,
                      "blocks": int(arrs.n_blocks)}))


if __name__ == "__main__":
    main()
