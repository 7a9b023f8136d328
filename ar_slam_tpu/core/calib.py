"""Focal-length self-calibration from square-tag homographies.

The reference initializes the shared focal length to a fixed 3000.0
(ar_slam_util.hpp:69) and relies on LM to fix it — which strands the solve
in a poor basin when the true focal is far away (the bundled demo images
have focal ≈ 760 px; from 3000 every descent method plateaus at ~10 px
RMSE vs ~0.5 px at the optimum).

This module replaces the magic constant with a classical planar
self-calibration: each detected tag is a square of known size, so the
4-corner DLT homography H = [h1 h2 h3] (tag plane → centered image) must
satisfy, for K = diag(f, f, 1) (principal point at center, square pixels):

    h1ᵀ ω h2 = 0          with  ω = K⁻ᵀ K⁻¹
    h1ᵀ ω h1 = h2ᵀ ω h2

each yielding a closed-form f² estimate; the median over all detections in
all captures is robust to the near-degenerate (fronto-parallel) tags whose
h31, h32 ≈ 0.  Controlled by ``CameraConfig.focal_init_mode`` ("homography"
default, "fixed" for reference parity).
"""

from __future__ import annotations

import numpy as np

_DIRS = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def homography_4pt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact DLT homography from 4 correspondences (src (4,2) → dst (4,2))."""
    rows = []
    for (x, y), (u, v) in zip(src, dst):
        rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        rows.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    a = np.asarray(rows)
    _, _, vt = np.linalg.svd(a)
    h = vt[-1].reshape(3, 3)
    if abs(h[2, 2]) > 1e-12:
        h = h / h[2, 2]
    return h


def focal_estimates_from_rect(corners: np.ndarray, aruco_size: float):
    """Yield f² estimates from one detected rect (centered coords)."""
    src = _DIRS * (0.5 * aruco_size)
    h = homography_4pt(src, np.asarray(corners, dtype=float))
    h1, h2 = h[:, 0], h[:, 1]
    out = []
    den = h1[2] * h2[2]
    if abs(den) > 1e-12:
        f2 = -(h1[0] * h2[0] + h1[1] * h2[1]) / den
        if f2 > 0:
            out.append(f2)
    den = h2[2] ** 2 - h1[2] ** 2
    if abs(den) > 1e-12:
        f2 = (h1[0] ** 2 + h1[1] ** 2 - h2[0] ** 2 - h2[1] ** 2) / den
        if f2 > 0:
            out.append(f2)
    return out


def estimate_focal(rects, aruco_size: float) -> float | None:
    """Median-aggregate focal estimate over an iterable of (4,2) rects.

    Returns None when no usable constraints exist (all tags fronto-parallel).
    """
    f2s: list[float] = []
    for corners in rects:
        f2s.extend(focal_estimates_from_rect(corners, aruco_size))
    if not f2s:
        return None
    return float(np.sqrt(np.median(f2s)))
