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
    out = []
    for a, b in focal_constraints_from_rect(corners, aruco_size):
        if abs(a) > 1e-12:
            f2 = b / a
            if f2 > 0:
                out.append(f2)
    return out


def focal_constraints_from_rect(corners: np.ndarray, aruco_size: float):
    """Linear constraints ``a·f² = b`` from one rect's homography.

    The IAC equations multiplied through by f² — h1ᵀωh2 = 0 becomes
    h31·h32·f² = −(h11·h21 + h12·h22), and the equal-norm equation
    (h31² − h32²)·f² = h11² + h12² − h21² − h22².  In this form a
    near-fronto-parallel tag contributes a ≈ 0: it self-downweights in a
    least-squares aggregate instead of producing a noise-ratio estimate.
    (The earlier per-tag ratio + f²>0 censoring biased the aggregate ~70%
    high on a near-frontal 10k-tag synthetic — enough to strand the whole
    bundle adjustment in the planar focal/depth-ambiguity basin.)
    """
    src = _DIRS * (0.5 * aruco_size)
    h = homography_4pt(src, np.asarray(corners, dtype=float))
    # scale-normalize so constraints are comparable across detections
    norm = np.linalg.norm(h)
    if norm < 1e-12:
        return []
    h = h / norm
    h1, h2 = h[:, 0], h[:, 1]
    return [
        (h1[2] * h2[2], -(h1[0] * h2[0] + h1[1] * h2[1])),
        (h1[2] ** 2 - h2[2] ** 2,
         h2[0] ** 2 + h2[1] ** 2 - h1[0] ** 2 - h1[1] ** 2),
    ]


def estimate_focal(rects, aruco_size: float) -> float | None:
    """Focal estimate over an iterable of (4,2) rects: self-weighted least
    squares over the linear constraints a·f² = b (see
    focal_constraints_from_rect), with one IRLS trimming pass to shed
    outlier homographies.  Near-frontal tags carry a ≈ 0 and contribute
    nothing — the estimate comes from whatever tilt the data actually has.

    Returns None when no usable constraints exist (all tags exactly
    fronto-parallel).
    """
    ab = []
    for corners in rects:
        ab.extend(focal_constraints_from_rect(corners, aruco_size))
    if not ab:
        return None
    a = np.array([x[0] for x in ab])
    b = np.array([x[1] for x in ab])
    denom = float(np.dot(a, a))
    if denom < 1e-24:
        return None
    f2 = float(np.dot(a, b)) / denom
    # trim: drop the worst-residual half (scaled residuals), re-solve —
    # robustifies against the few grossly wrong homographies without the
    # positivity-censoring bias of the per-tag ratio median
    r = np.abs(a * f2 - b)
    keep = r <= np.median(r)
    if keep.sum() >= 8:
        ak, bk = a[keep], b[keep]
        d2 = float(np.dot(ak, ak))
        if d2 > 1e-24:
            f2 = float(np.dot(ak, bk)) / d2
    if not np.isfinite(f2) or f2 <= 0:
        return None
    return float(np.sqrt(f2))
