"""AOT HBM probe for the large-map LM program (round-5 40k-tag work).

Compiles ``lm_solve`` at a given padded scale from ShapeDtypeStructs only —
no problem generation (240 s at 40k tags), no execution — and prints the
compiler's memory analysis.  The remote axon compile service does chipless
AOT compilation, so an over-HBM program fails HERE with the allocation
table, making layout iteration ~60 s per attempt instead of ~6 min.

Default shapes replicate the measured 40k-tag / 16k-capture / 1.05M-block
big_map_bench case (tools/big_map_bench.py --tags 40000 --caps 16000).

Usage: python tools/hbm_probe.py [--tag-rows N] [--cap-rows N] ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b-pad", type=int, default=1050624)
    ap.add_argument("--t-pad", type=int, default=36864)
    ap.add_argument("--c-pad", type=int, default=16384)
    ap.add_argument("--obs-per-tag", type=int, default=64)
    ap.add_argument("--obs-per-cap", type=int, default=96)
    ap.add_argument("--row-slots", type=int, default=8)
    ap.add_argument("--tag-rows", type=int, default=146944)
    ap.add_argument("--cap-rows", type=int, default=137728)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--solver", default="cg")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ar_slam_tpu.solve.lm import LMConfig, lm_solve

    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    a = (
        S((3,), f32),                      # camera
        S((args.c_pad, 6), f32),           # cap_poses
        S((args.t_pad, 6), f32),           # tag_poses
        S((args.b_pad,), jnp.int32),       # cap_idx
        S((args.b_pad,), jnp.int32),       # tag_idx
        S((args.b_pad, 4, 2), f32),        # corners
        S((args.b_pad,), jnp.bool_),       # block_mask
        S((), jnp.bool_),                  # cam_active
        S((args.c_pad,), jnp.bool_),       # cap_active
        S((args.t_pad,), jnp.bool_),       # tag_active
    )
    config = LMConfig(max_iterations=args.iters, function_tolerance=0.0,
                      parameter_tolerance=0.0, linear_solver=args.solver,
                      cg_max_iterations=25)
    kw = dict(aruco_size=0.0635, config=config,
              iter_budget=S((), jnp.int32),
              obs_per_tag=args.obs_per_tag, obs_per_cap=args.obs_per_cap)
    if args.solver == "cg":
        kw.update(row_slots=args.row_slots, tag_rows=args.tag_rows,
                  cap_rows=args.cap_rows)
    lowered = lm_solve.lower(*a, **kw)
    try:
        compiled = lowered.compile()
    except Exception as e:  # noqa: BLE001
        print("COMPILE FAILED:")
        print(str(e)[:8000])
        sys.exit(1)
    m = compiled.memory_analysis()
    gb = 1024**3
    print(f"temp {m.temp_size_in_bytes/gb:.2f}G  "
          f"args {m.argument_size_in_bytes/gb:.2f}G  "
          f"out {m.output_size_in_bytes/gb:.2f}G  "
          f"gen(code) {m.generated_code_size_in_bytes/2**20:.1f}M  "
          f"alias {m.alias_size_in_bytes/gb:.2f}G")
    total = (m.temp_size_in_bytes + m.argument_size_in_bytes
             + m.output_size_in_bytes - m.alias_size_in_bytes)
    print(f"TOTAL ~{total/gb:.2f}G of 15.75G v5e HBM")


if __name__ == "__main__":
    main()
