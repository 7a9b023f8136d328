"""Batched linearization of the reprojection problem.

Per block (one tag observed in one capture) the residual is 8 values and the
Jacobian splits into three parameter blocks — camera (3), capture inverse
pose (6), tag pose (6) — mirroring the reference's
``AutoDiffCostFunction<ArucoReprojectionError, 8, 3, 6, 6>``
(ar_slam_util.cpp:826-836).  Derivatives come from ``jax.jacfwd`` vmapped
over the padded block table; XLA fuses the 15 forward tangents into one
batched computation, the TPU analogue of ceres Jet autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ar_slam_tpu.core.projection import block_residual


def _one_block(camera, cap_pose, tag_pose, corners, aruco_size,
               distortion=False):
    return block_residual(camera, cap_pose, tag_pose, corners, aruco_size,
                          distortion)


def linearize(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
              block_mask, aruco_size, distortion=False):
    """Residuals + Jacobian blocks for every block in the padded table.

    Returns:
      r:  (B, 8)   residuals (masked rows zero)
      jc: (B, 8, 3) d r / d camera
      jp: (B, 8, 6) d r / d capture inverse pose
      jt: (B, 8, 6) d r / d tag pose
    """

    def res(camera, cap_pose, tag_pose, corners):
        r = _one_block(camera, cap_pose, tag_pose, corners, aruco_size,
                       distortion)
        return r, r  # aux carries the primal out of jacfwd for free

    def res_and_jac(cap_i, tag_i, crn):
        cap_pose = cap_poses[cap_i]
        tag_pose = tag_poses[tag_i]
        (jc, jp, jt), r = jax.jacfwd(res, argnums=(0, 1, 2), has_aux=True)(
            camera, cap_pose, tag_pose, crn
        )
        return r, jc, jp, jt

    r, jc, jp, jt = jax.vmap(res_and_jac)(cap_idx, tag_idx, corners)
    # where-based masking (not multiply): inactive rows may hold inf/NaN
    # garbage and inf * 0 = NaN would poison the normal equations.
    m = block_mask[:, None]
    return (
        jnp.where(m, r, 0.0),
        jnp.where(m[:, :, None], jc, 0.0),
        jnp.where(m[:, :, None], jp, 0.0),
        jnp.where(m[:, :, None], jt, 0.0),
    )


def residuals_only(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
                   block_mask, aruco_size, distortion=False):
    """(B, 8) masked residuals without Jacobians (for cost evaluation)."""

    def res(cap_i, tag_i, crn):
        return _one_block(camera, cap_poses[cap_i], tag_poses[tag_i], crn,
                          aruco_size, distortion)

    r = jax.vmap(res)(cap_idx, tag_idx, corners)
    return jnp.where(block_mask[:, None], r, 0.0)


def total_cost(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
               block_mask, aruco_size, distortion=False):
    """0.5 * sum of squared residuals (ceres cost convention)."""
    r = residuals_only(camera, cap_poses, tag_poses, cap_idx, tag_idx,
                       corners, block_mask, aruco_size, distortion)
    return 0.5 * jnp.sum(r * r)
