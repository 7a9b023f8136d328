"""One-time external CPU anchor for the BA baseline (VERDICT r1 item 9).

Round 1's ``vs_baseline`` compared the TPU solver against THIS REPO's own
CPU float64 path — self-referential.  This tool runs an INDEPENDENT
implementation — scipy.optimize.least_squares (Trust Region Reflective,
sparse finite-difference Jacobian, lsmr sub-solver; the closest
pip-installable stand-in for single-thread Ceres, which is not available in
this image) — on the same 500-tag / 200-capture synthetic problem
(BASELINE config #5) and reports wall time, iteration count and final cost,
so the repo's CPU-path numbers can be sanity-anchored in BASELINE.md.

The residual model is an independent NumPy/SciPy re-implementation of the
reference projection (ar_slam_util.cpp:131-172: inverse-pose
translate-then-rotate, centered pixels, focal multiply), NOT a call into
ar_slam_tpu kernels.

Usage: python tools/cpu_anchor.py [--tags 500] [--caps 200] [--max-iters 25]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tags", type=int, default=500)
    ap.add_argument("--caps", type=int, default=200)
    ap.add_argument("--max-iters", type=int, default=25)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_problem

    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix
    from scipy.spatial.transform import Rotation

    arrs, cap_poses, tag_poses = build_problem(args.tags, args.caps,
                                               dtype=np.float64)
    m = np.asarray(arrs.block_mask)
    ci = np.asarray(arrs.cap_idx)[m]
    ti = np.asarray(arrs.tag_idx)[m]
    obs = np.asarray(arrs.corners)[m]  # (B, 4, 2) centered pixels
    b = ci.shape[0]
    n_caps = cap_poses.shape[0]
    n_tags = tag_poses.shape[0]
    aruco = 0.0635

    dirs = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    corners_local = np.concatenate(
        [0.5 * aruco * dirs, np.zeros((4, 1))], axis=1)  # (4, 3)

    def unpack(x):
        cam = x[0]
        caps = x[1:1 + 6 * n_caps].reshape(n_caps, 6)
        tags = x[1 + 6 * n_caps:].reshape(n_tags, 6)
        return cam, caps, tags

    def residuals(x):
        focal, caps, tags = unpack(x)
        r_t = Rotation.from_rotvec(tags[ti, 3:6]).as_matrix()  # (B,3,3)
        p_w = np.einsum("bij,cj->bci", r_t, corners_local) + tags[ti, None, 0:3]
        r_c = Rotation.from_rotvec(caps[ci, 3:6]).as_matrix()
        p_c = np.einsum("bij,bcj->bci", r_c, p_w + caps[ci, None, 0:3])
        z = np.maximum(np.abs(p_c[..., 2]), 1e-9) * np.sign(p_c[..., 2] + 1e-30)
        uv = focal * p_c[..., 0:2] / z[..., None]
        return (uv - obs).reshape(-1)

    # parameter vector: [focal, cap poses, tag poses] (l1, l2 are disabled
    # in the reference model, ar_slam_util.cpp:164-171 — omitted here)
    x0 = np.concatenate([
        np.asarray(arrs.camera[:1], np.float64),
        np.asarray(cap_poses, np.float64).reshape(-1),
        np.asarray(tag_poses, np.float64).reshape(-1),
    ])

    # block-sparse Jacobian pattern: 8 residuals x (focal + its capture's 6
    # + its tag's 6)
    n_par = x0.size
    pat = lil_matrix((8 * b, n_par), dtype=bool)
    rows = np.arange(8 * b).reshape(b, 8)
    for blk in range(b):
        pat[rows[blk], 0] = True
        pat[rows[blk], 1 + 6 * ci[blk]: 1 + 6 * ci[blk] + 6] = True
        c0 = 1 + 6 * n_caps + 6 * ti[blk]
        pat[rows[blk], c0:c0 + 6] = True

    r0 = residuals(x0)
    cost0 = 0.5 * float(r0 @ r0)
    t0 = time.time()
    res = least_squares(
        residuals, x0, jac_sparsity=pat, method="trf", tr_solver="lsmr",
        max_nfev=args.max_iters * 40, verbose=0,
    )
    wall = time.time() - t0
    iters = int(res.njev)
    out = {
        "tool": "scipy.least_squares trf+lsmr (sparse 2-point jac)",
        "blocks": int(b),
        "params": int(n_par),
        "initial_cost": cost0,
        "final_cost": float(res.cost),
        "final_rmse_px": float(np.sqrt(2.0 * res.cost / r0.size)),
        "wall_s": round(wall, 2),
        "jacobian_evals": iters,
        "nfev": int(res.nfev),
        "iters_per_s": round(iters / wall, 4),
        "status": int(res.status),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
