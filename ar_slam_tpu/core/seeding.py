"""PnP-lite pose seeding (pure jnp, batchable).

Re-derivation of the reference's initialization heuristics
(calcInitValues / initCapturePose / initArPose, ar_slam_util.cpp:52-128):

- Depth guess from the longest edge of the detected rect:
  ``z = focal * aruco_size / max_edge`` (ar_slam_util.cpp:83).
- x, y by back-projecting the corner centroid (ar_slam_util.cpp:84-85).
- In-plane (z) rotation = running average of per-corner angle deltas versus
  the canonical ARUCO_DIRECTIONS (ar_slam_util.cpp:72-80).  Out-of-plane
  rotation is not estimated (TODO in the reference, ar_slam_util.cpp:70).
"""

from __future__ import annotations

import jax.numpy as jnp

from ar_slam_tpu.core.lie import (
    axis_angle_rotate,
    compose_axis_angle,
    normalize_angle,
)
from ar_slam_tpu.core.projection import ARUCO_DIRECTIONS


def calc_init_values(corners, focal, aruco_size):
    """Estimate (local_x, local_y, local_z, rot_z) of a tag in the camera
    frame from its detected rect.

    Args:
      corners: (4, 2) detected corners, centered pixel coords.
      focal: scalar focal length.
      aruco_size: scalar tag edge length (meters).

    Returns:
      (4,) array [local_x, local_y, local_z, rot_z].
    """
    corners = jnp.asarray(corners)
    nxt = jnp.roll(corners, shift=-1, axis=0)  # corner (idx+1) & 3
    edge_sq = jnp.sum((corners - nxt) ** 2, axis=-1)
    max_edge = jnp.sqrt(jnp.max(edge_sq))
    center = jnp.mean(corners, axis=0)

    directions = ARUCO_DIRECTIONS.astype(corners.dtype)
    expected = jnp.arctan2(directions[:, 1], directions[:, 0])
    actual = jnp.arctan2(corners[:, 1] - center[1], corners[:, 0] - center[0])
    delta = normalize_angle(actual - expected)

    # Sequential running average (avg += normalize(delta - avg)/(i+1)) —
    # order-dependent through the normalize, so replicated exactly.
    avg = delta[0]
    for idx in range(1, 4):
        avg = avg + normalize_angle(delta[idx] - avg) / (idx + 1)

    local_z = focal * aruco_size / max_edge
    local_x = center[0] * local_z / focal
    local_y = center[1] * local_z / focal
    return jnp.stack([local_x, local_y, local_z, avg])


def init_capture_pose(corners, camera, ar_pose, aruco_size):
    """Seed a capture's INVERSE pose from one observed tag with known pose
    (≙ initCapturePose, ar_slam_util.cpp:91-108).

    Returns: (6,) inverse capture pose.
    """
    camera = jnp.asarray(camera)
    ar_pose = jnp.asarray(ar_pose)
    vals = calc_init_values(corners, camera[0], aruco_size)
    local_position = vals[0:3]
    local_rot = jnp.stack([jnp.zeros_like(vals[3]), jnp.zeros_like(vals[3]), vals[3]])
    inv_rot = compose_axis_angle(local_rot, -ar_pose[3:6])
    cap_rotation = -inv_rot
    inv_t = axis_angle_rotate(cap_rotation, local_position) - ar_pose[0:3]
    return jnp.concatenate([inv_t, inv_rot])


def init_ar_pose(corners, camera, inv_cap_pose, aruco_size):
    """Seed a tag's pose from one observing capture with known pose
    (≙ initArPose, ar_slam_util.cpp:111-128).

    Returns: (6,) tag pose.
    """
    camera = jnp.asarray(camera)
    inv_cap_pose = jnp.asarray(inv_cap_pose)
    vals = calc_init_values(corners, camera[0], aruco_size)
    local_position = vals[0:3]
    cap_rotation = -inv_cap_pose[3:6]
    ar_t = axis_angle_rotate(cap_rotation, local_position) - inv_cap_pose[0:3]
    local_rot = jnp.stack([jnp.zeros_like(vals[3]), jnp.zeros_like(vals[3]), vals[3]])
    ar_rot = compose_axis_angle(cap_rotation, local_rot)
    return jnp.concatenate([ar_t, ar_rot])
