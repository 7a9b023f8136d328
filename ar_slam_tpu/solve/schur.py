"""Gauss–Newton normal equations with Schur elimination of tag blocks.

The TPU-native replacement for ceres' DENSE_SCHUR linear solver
(ar_slam_util.cpp:1011): tag (landmark) 6x6 blocks are eliminated first —
they are conditionally independent given the cameras — leaving a dense
reduced system over [camera(3); capture poses(6C)] that maps onto the MXU as
plain matmuls.

Everything here is shape-static over the padded problem
(C_pad caps, T_pad tags, B_pad blocks) and fully differentiable-free (only
linear algebra), so it jits once per bucket size.

Layout notes:
- The reduced vector is x = [cam(3), cap_0(6), cap_1(6), ...] of length
  Nr = 3 + 6*C_pad.
- W (cap/cam × tag coupling) is materialized dense [Nr, 6*T_pad] by reshape
  of per-(cap,tag) segment sums — no scatter in the hot path except the
  block-diagonal placement of the per-capture 6x6 blocks.
- Per-tag 6x6 inverses are batched; S = A - W V^{-1} W^T is one batched
  einsum (MXU) + a dense Cholesky solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ops import segment_sum


class NormalEqs(NamedTuple):
    """Assembled blocks of J^T J and J^T r, pre-damping/scaling."""

    hcc: jnp.ndarray  # (3, 3) cam-cam
    hcp: jnp.ndarray  # (C, 3, 6) cam-cap
    hpp: jnp.ndarray  # (C, 6, 6) cap-cap diag blocks
    hct: jnp.ndarray  # (T, 3, 6) cam-tag
    hpt: jnp.ndarray  # (6C, 6T) cap-tag coupling, flat (block-sparse scatter)
    htt: jnp.ndarray  # (T, 6, 6) tag-tag diag blocks
    g_c: jnp.ndarray  # (3,)
    g_p: jnp.ndarray  # (C, 6)
    g_t: jnp.ndarray  # (T, 6)


def assemble(r, jc, jp, jt, cap_idx, tag_idx, n_caps, n_tags) -> NormalEqs:
    """Segment-reduce per-block Jacobian products into H blocks.

    In the distributed solver each device assembles over its block shard and
    the results are psum-reduced — every field of NormalEqs is an additive
    sum over blocks.
    """
    hcc = jnp.einsum("bri,brj->ij", jc, jc)
    hcp = segment_sum(jnp.einsum("bri,brj->bij", jc, jp), cap_idx,
                      num_segments=n_caps)
    hpp = segment_sum(jnp.einsum("bri,brj->bij", jp, jp), cap_idx,
                      num_segments=n_caps)
    hct = segment_sum(jnp.einsum("bri,brj->bij", jc, jt), tag_idx,
                      num_segments=n_tags)
    # cap-tag coupling scattered straight into the flat (6C, 6T) matrix —
    # each (capture, tag) pair appears in at most one block, so this is a
    # pure scatter-add with no dense (C, T) intermediate.
    hpt_b = jnp.einsum("bri,brj->bij", jp, jt)  # (B, 6, 6)
    six = jnp.arange(6)
    rows = cap_idx[:, None, None] * 6 + six[None, :, None]  # (B, 6, 6)
    cols = tag_idx[:, None, None] * 6 + six[None, None, :]
    hpt = jnp.zeros((6 * n_caps, 6 * n_tags), dtype=hcc.dtype)
    hpt = hpt.at[jnp.broadcast_to(rows, hpt_b.shape),
                 jnp.broadcast_to(cols, hpt_b.shape)].add(hpt_b)
    htt = segment_sum(jnp.einsum("bri,brj->bij", jt, jt), tag_idx,
                      num_segments=n_tags)
    g_c = jnp.einsum("bri,br->i", jc, r)
    g_p = segment_sum(jnp.einsum("bri,br->bi", jp, r), cap_idx,
                      num_segments=n_caps)
    g_t = segment_sum(jnp.einsum("bri,br->bi", jt, r), tag_idx,
                      num_segments=n_tags)
    return NormalEqs(hcc, hcp, hpp, hct, hpt, htt, g_c, g_p, g_t)


def schur_solve(eqs: NormalEqs, lam, cam_active, cap_active, tag_active,
                jacobi_scaling: bool = True,
                min_diag: float = 1e-6, max_diag: float = 1e32):
    """Solve the damped normal equations (H + lam * clamp(diag)) delta = -g.

    Args:
      eqs: assembled blocks.
      lam: LM damping parameter (scalar).
      cam_active: () bool — False freezes the camera block (localization
        mode, ≙ SetParameterBlockConstant at ar_slam_util.cpp:972).
      cap_active: (C,) bool mask of captures participating in this solve.
      tag_active: (T,) bool mask (False = frozen or padding,
        ≙ ar_slam_util.cpp:965).

    Returns:
      (delta_cam (3,), delta_cap (C, 6), delta_tag (T, 6))
    """
    dtype = eqs.hcc.dtype
    C = eqs.hpp.shape[0]
    T = eqs.htt.shape[0]
    nr = 3 + 6 * C

    cam_m = jnp.broadcast_to(cam_active, ()).astype(dtype)
    cap_m = cap_active.astype(dtype)  # (C,)
    tag_m = tag_active.astype(dtype)  # (T,)

    # ---- Jacobi column scaling: s = 1 / (1 + sqrt(diag(JtJ))) (ceres),
    # with the active-masks FOLDED INTO the scale vectors so scaling and
    # masking are one multiply chain over the big coupling matrix (the
    # elementwise passes over the (6C, 6T) hpt dominate this function's
    # cost on TPU — measured ~1.3 ms of 2.6 at 500 tags) -------------------
    d_c = jnp.diagonal(eqs.hcc)
    d_p = jnp.diagonal(eqs.hpp, axis1=-2, axis2=-1)  # (C, 6)
    d_t = jnp.diagonal(eqs.htt, axis1=-2, axis2=-1)  # (T, 6)
    if jacobi_scaling:
        s_c = cam_m / (1.0 + jnp.sqrt(jnp.maximum(d_c, 0.0)))
        s_p = cap_m[:, None] / (1.0 + jnp.sqrt(jnp.maximum(d_p, 0.0)))
        s_t = tag_m[:, None] / (1.0 + jnp.sqrt(jnp.maximum(d_t, 0.0)))
    else:
        s_c = jnp.broadcast_to(cam_m, d_c.shape)
        s_p = jnp.broadcast_to(cap_m[:, None], d_p.shape)
        s_t = jnp.broadcast_to(tag_m[:, None], d_t.shape)

    s_p_flat = s_p.reshape(-1)  # (6C,)
    s_t_flat = s_t.reshape(-1)  # (6T,)
    hcc = eqs.hcc * s_c[:, None] * s_c[None, :]
    hcp = eqs.hcp * s_c[None, :, None] * s_p[:, None, :]
    hpp = eqs.hpp * s_p[:, :, None] * s_p[:, None, :]
    hct = eqs.hct * s_c[None, :, None] * s_t[:, None, :]
    hpt = eqs.hpt * s_p_flat[:, None] * s_t_flat[None, :]
    htt = eqs.htt * s_t[:, :, None] * s_t[:, None, :]
    g_c = eqs.g_c * s_c
    g_p = eqs.g_p * s_p
    g_t = eqs.g_t * s_t

    # ---- damping: H + lam * clamp(diag(H'), min, max) --------------------
    dd_c = jnp.clip(jnp.diagonal(hcc), min_diag, max_diag)
    dd_p = jnp.clip(jnp.diagonal(hpp, axis1=-2, axis2=-1), min_diag, max_diag)
    dd_t = jnp.clip(jnp.diagonal(htt, axis1=-2, axis2=-1), min_diag, max_diag)
    eye6 = jnp.eye(6, dtype=dtype)
    hcc = hcc + lam * jnp.diag(dd_c)
    hpp = hpp + lam * dd_p[:, :, None] * eye6
    htt = htt + lam * dd_t[:, :, None] * eye6

    # Inactive tags get the identity so the batched inverse stays sane.
    htt = jnp.where(tag_m[:, None, None] > 0, htt, jnp.eye(6, dtype=dtype))

    # ---- eliminate tags: per-tag 6x6 inverse -----------------------------
    v_inv = jnp.linalg.inv(htt)  # (T, 6, 6), batched

    # W: [Nr, 6T] coupling of (cam, caps) to tags
    w_cam = hct.transpose(1, 0, 2).reshape(3, 6 * T)
    w = jnp.concatenate([w_cam, hpt], axis=0)  # (Nr, 6T)
    wt = w.reshape(nr, T, 6).transpose(1, 0, 2)  # (T, Nr, 6)

    # Y_t = W_t V_t^{-1}
    y = jnp.einsum("tnk,tkj->tnj", wt, v_inv)  # (T, Nr, 6)

    # ---- reduced system S = A - W V^{-1} W^T -----------------------------
    a = jnp.zeros((nr, nr), dtype=dtype)
    a = a.at[0:3, 0:3].set(hcc)
    hcp_flat = hcp.transpose(1, 0, 2).reshape(3, 6 * C)
    a = a.at[0:3, 3:].set(hcp_flat)
    a = a.at[3:, 0:3].set(hcp_flat.T)
    rows = 3 + (jnp.arange(C)[:, None, None] * 6 + jnp.arange(6)[None, :, None])
    cols = 3 + (jnp.arange(C)[:, None, None] * 6 + jnp.arange(6)[None, None, :])
    a = a.at[jnp.broadcast_to(rows, (C, 6, 6)),
             jnp.broadcast_to(cols, (C, 6, 6))].set(hpp)

    s_mat = a - jnp.einsum("tnk,tmk->nm", y, wt)

    # rhs = -g_r + W V^{-1} g_t
    g_r = jnp.concatenate([g_c, g_p.reshape(-1)])
    rhs = -g_r + jnp.einsum("tnk,tk->n", y, g_t)

    # identity rows for inactive reduced params so Cholesky is well-posed
    m_r = jnp.concatenate(
        [jnp.broadcast_to(cam_m, (3,)), jnp.repeat(cap_m, 6)]
    )
    s_mat = s_mat * m_r[:, None] * m_r[None, :] + jnp.diag(1.0 - m_r)
    rhs = rhs * m_r

    cho = jax.scipy.linalg.cho_factor(s_mat)
    delta_r = jax.scipy.linalg.cho_solve(cho, rhs)
    delta_r = delta_r * m_r

    # ---- back-substitute tags: delta_t = -V^{-1} (g_t + W^T delta_r) -----
    wtd = jnp.einsum("tnk,n->tk", wt, delta_r)  # (T, 6)
    delta_t = -jnp.einsum("tkj,tj->tk", v_inv, g_t + wtd) * tag_m[:, None]

    # ---- unscale ---------------------------------------------------------
    delta_cam = delta_r[0:3] * s_c
    delta_cap = delta_r[3:].reshape(C, 6) * s_p
    delta_tag = delta_t * s_t
    return delta_cam, delta_cap, delta_tag
