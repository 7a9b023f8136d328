"""Axis-angle rotation algebra, autodiff-safe at theta -> 0.

Pure jnp re-derivation of the rotation kernels the reference pulls from
ceres/rotation.h (AngleAxisRotatePoint, AngleAxisToQuaternion,
QuaternionToAngleAxis, QuaternionProduct — used by composeAxisAngle at
ar_slam_util.cpp:41-50 and projectCorner at ar_slam_util.cpp:131-172).

Conventions (identical to the reference):
- axis-angle vector ``aa``: direction = rotation axis, norm = rotation angle.
- quaternions are (w, x, y, z), scalar first (ceres order,
  ar_slam_util.cpp:1046).
- negating an axis-angle vector inverts the rotation.

Every function is elementwise over leading batch dims only via explicit vmap
by callers; bodies are written for a single (3,) / (4,) vector so jacfwd stays
dense and small.

Small-angle handling: each ``sin``/``cos`` ratio is replaced by its Taylor
series under a ``theta^2 < eps`` switch using the double-where trick so both
the value and its JVP are finite at exactly zero.
"""

from __future__ import annotations

import jax.numpy as jnp

# Switch point between closed form and Taylor series.  Series error is
# O(t^4) ~ 1e-24 at the boundary for f64 and far below ulp for f32.
_SMALL_SQ = 1e-12


def _safe_ratio(theta_sq, closed_form_fn, series_fn):
    """Evaluate closed_form_fn(theta_sq) where theta_sq is large, series
    elsewhere, with NaN-free gradients (double-where trick)."""
    safe = jnp.where(theta_sq < _SMALL_SQ, 1.0, theta_sq)
    return jnp.where(
        theta_sq < _SMALL_SQ, series_fn(theta_sq), closed_form_fn(safe)
    )


def axis_angle_rotate(aa, p):
    """Rotate point ``p`` (3,) by axis-angle ``aa`` (3,).

    Rodrigues in ratio form (safe at theta=0):
      R p = p cos(t) + (aa x p) sin(t)/t + aa (aa . p) (1 - cos(t))/t^2
    """
    aa = jnp.asarray(aa)
    p = jnp.asarray(p)
    theta_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)

    cos_t = _safe_ratio(
        theta_sq,
        lambda t2: jnp.cos(jnp.sqrt(t2)),
        lambda t2: 1.0 - t2 / 2.0 + t2 * t2 / 24.0,
    )
    sinc = _safe_ratio(
        theta_sq,
        lambda t2: jnp.sin(jnp.sqrt(t2)) / jnp.sqrt(t2),
        lambda t2: 1.0 - t2 / 6.0 + t2 * t2 / 120.0,
    )
    one_minus_cos_over_sq = _safe_ratio(
        theta_sq,
        lambda t2: (1.0 - jnp.cos(jnp.sqrt(t2))) / t2,
        lambda t2: 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
    )

    cross = jnp.cross(aa, p)
    dot = jnp.sum(aa * p, axis=-1, keepdims=True)
    return p * cos_t + cross * sinc + aa * (dot * one_minus_cos_over_sq)


def axis_angle_to_quaternion(aa):
    """(3,) axis-angle -> (4,) quaternion (w, x, y, z)."""
    aa = jnp.asarray(aa)
    theta_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    half = 0.25 * theta_sq  # (t/2)^2
    w = _safe_ratio(
        theta_sq,
        lambda t2: jnp.cos(0.5 * jnp.sqrt(t2)),
        lambda t2: 1.0 - t2 / 8.0 + t2 * t2 / 384.0,
    )
    # sin(t/2)/t
    k = _safe_ratio(
        theta_sq,
        lambda t2: jnp.sin(0.5 * jnp.sqrt(t2)) / jnp.sqrt(t2),
        lambda t2: 0.5 - t2 / 48.0 + t2 * t2 / 3840.0,
    )
    del half
    return jnp.concatenate([w, aa * k], axis=-1)


def quaternion_to_axis_angle(q):
    """(4,) quaternion (w, x, y, z) -> (3,) axis-angle.

    theta = 2 atan2(|v|, w); aa = v * theta/|v|.  Assumes w >= 0 inputs are
    not required: atan2 handles both hemispheres like ceres does.
    """
    q = jnp.asarray(q)
    w = q[..., :1]
    v = q[..., 1:]
    n_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    safe_n_sq = jnp.where(n_sq < _SMALL_SQ, 1.0, n_sq)
    n = jnp.sqrt(safe_n_sq)
    # Short representation (|theta| <= pi), flipping hemisphere when w < 0
    # exactly like ceres::QuaternionToAngleAxis.
    two_theta = 2.0 * jnp.where(
        w < 0.0, jnp.arctan2(-n, -w), jnp.arctan2(n, w)
    )
    closed = two_theta / n
    # series at n->0 (w ~ +-1): 2/w - 2 n^2 / (3 w^3)
    series = 2.0 / jnp.where(jnp.abs(w) < 1e-30, 1.0, w) * (1.0 - n_sq / (3.0 * w * w))
    scale = jnp.where(n_sq < _SMALL_SQ, series, closed)
    return v * scale


def quaternion_product(q1, q2):
    """Hamilton product, (w, x, y, z) order (≙ ceres::QuaternionProduct)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def compose_axis_angle(rot1, rot2):
    """Compose two axis-angle rotations: result = rot1 then... (matches the
    reference composeAxisAngle, ar_slam_util.cpp:41-50: quaternion product
    q(rot1) * q(rot2), i.e. applying result == applying rot2 first)."""
    q1 = axis_angle_to_quaternion(rot1)
    q2 = axis_angle_to_quaternion(rot2)
    return quaternion_to_axis_angle(quaternion_product(q1, q2))


def invert_axis_angle(aa):
    """Inverse rotation = negated axis-angle."""
    return -jnp.asarray(aa)


def axis_angle_to_matrix(aa):
    """(3,) axis-angle -> (3, 3) rotation matrix (Rodrigues)."""
    aa = jnp.asarray(aa)
    eye = jnp.eye(3, dtype=aa.dtype)
    return jnp.stack(
        [axis_angle_rotate(aa, eye[i]) for i in range(3)], axis=1
    )


def matrix_to_quaternion(m):
    """(3, 3) rotation matrix -> (4,) quaternion (w, x, y, z), robust for all
    rotation angles (Shepperd's method, branch-free via jnp.where)."""
    m = jnp.asarray(m)
    m00, m01, m02 = m[0, 0], m[0, 1], m[0, 2]
    m10, m11, m12 = m[1, 0], m[1, 1], m[1, 2]
    m20, m21, m22 = m[2, 0], m[2, 1], m[2, 2]
    tr = m00 + m11 + m22

    # four candidate extractions, each numerically good in its region
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                          (m10 - m01) / s])

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                          (m02 + m20) / s])

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                          (m12 + m21) / s])

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                          0.25 * s])

    use_w = (tr > m00) & (tr > m11) & (tr > m22) | (tr > 0.0)
    use_x = (m00 >= m11) & (m00 >= m22) & ~use_w
    use_y = (m11 > m00) & (m11 >= m22) & ~use_w
    q = jnp.where(
        use_w, cand_w(),
        jnp.where(use_x, cand_x(), jnp.where(use_y, cand_y(), cand_z())),
    )
    return q / jnp.linalg.norm(q)


def matrix_to_axis_angle(m):
    """(3, 3) rotation matrix -> (3,) axis-angle, robust near theta = pi."""
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def normalize_angle(angle):
    """Wrap angle to [-pi, pi) (≙ normalize_angle, ar_slam_util.hpp:348-351)."""
    two_pi = 2.0 * jnp.pi
    return jnp.mod(jnp.mod(angle, two_pi) + 3.0 * jnp.pi, two_pi) - jnp.pi
