"""Distributed LM: shard_map block-parallel hooks with psum reductions.

Design (SURVEY.md §2.3, §5.7-5.8): observations shard over the 1-D
``blocks`` mesh axis; every quantity the LM driver needs — the assembled
NormalEqs (per-tag V blocks, the flat cap–tag coupling, gradients) and the
step-quality scalars — is an additive sum over blocks, so each device
assembles over its shard and one ``psum`` over ICI produces the replicated
reduced system.  The Schur solve + damping logic then run replicated (they
are tiny), and pose state never leaves the device mesh.

Communication per LM iteration:
  psum(NormalEqs)  ~ O(T*36 + 6C*6T + C*36 + ...) floats
  psum(3 scalars)  for step quality
Everything else is local.  This is the ≥80%-scaling-efficiency path for the
500-tag / 200-capture baseline config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ar_slam_tpu.parallel.mesh import BLOCK_AXIS
from ar_slam_tpu.solve.lm import LMConfig, lm_core
from ar_slam_tpu.solve.residuals import linearize, residuals_only
from ar_slam_tpu.solve.schur import NormalEqs, assemble


def make_dist_block_hooks(mesh, cap_idx, tag_idx, corners, block_mask,
                          aruco_size, n_caps, n_tags):
    """Block-parallel hooks whose reductions psum over the mesh.

    The hook outputs are replicated; inputs (block tables) are sharded on
    the leading axis.  aux (r + Jacobian blocks) stays sharded between the
    two hooks — it never crosses the interconnect.
    """
    blockspec = P(BLOCK_AXIS)
    rep = P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, blockspec, blockspec, blockspec, blockspec),
        out_specs=(rep, rep, (blockspec, blockspec, blockspec, blockspec)),
    )
    def _lin(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
             block_mask):
        r, jc, jp, jt = linearize(
            camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
            block_mask, aruco_size,
        )
        eqs = assemble(r, jc, jp, jt, cap_idx, tag_idx, n_caps, n_tags)
        eqs = NormalEqs(*[jax.lax.psum(f, BLOCK_AXIS) for f in eqs])
        cost = jax.lax.psum(0.5 * jnp.sum(r * r), BLOCK_AXIS)
        return eqs, cost, (r, jc, jp, jt)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (blockspec, blockspec, blockspec, blockspec),
            rep, rep, rep, rep, rep, rep,
            blockspec, blockspec, blockspec, blockspec,
        ),
        out_specs=(rep, rep, rep),
    )
    def _quality(aux, new_camera, new_caps, new_tags, d_cam, d_cap, d_tag,
                 cap_idx, tag_idx, corners, block_mask):
        r, jc, jp, jt = aux
        r_new = residuals_only(
            new_camera, new_caps, new_tags, cap_idx, tag_idx, corners,
            block_mask, aruco_size,
        )
        new_cost = jax.lax.psum(0.5 * jnp.sum(r_new * r_new), BLOCK_AXIS)
        jd = (
            jnp.einsum("brc,c->br", jc, d_cam)
            + jnp.einsum("brp,bp->br", jp, d_cap[cap_idx])
            + jnp.einsum("brp,bp->br", jt, d_tag[tag_idx])
        )
        g_dot_d = jax.lax.psum(jnp.sum(jd * r), BLOCK_AXIS)
        jd_sq = jax.lax.psum(jnp.sum(jd * jd), BLOCK_AXIS)
        return new_cost, g_dot_d, jd_sq

    def lin_fn(camera, cap_poses, tag_poses):
        return _lin(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
                    block_mask)

    def quality_fn(aux, new_camera, new_caps, new_tags, d_cam, d_cap, d_tag):
        return _quality(aux, new_camera, new_caps, new_tags, d_cam, d_cap,
                        d_tag, cap_idx, tag_idx, corners, block_mask)

    return lin_fn, quality_fn


def make_dist_wave_solver(mesh, *, aruco_size: float, config: LMConfig,
                          seed_mode: str = "hybrid"):
    """Build a jitted distributed wave solver (seeding prologue + LM).

    Mirrors ``solve.batch.solve_wave`` but with the block axis sharded over
    ``mesh``: the seed gathers run under jit on the sharded tables (XLA
    inserts the tiny collective), then the LM loop uses the shard_map hooks
    whose normal-equation reductions psum over ICI.  Created once per
    _WaveRunner; re-used across waves so the program compiles once per
    padded-size bucket.
    """

    @jax.jit
    def run(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
            block_mask, cam_active, cap_active, tag_active,
            seed_cap, seed_block, tag_init_blocks, lm_enabled=True):
        from ar_slam_tpu.solve.batch import apply_wave_seeds

        n_caps = cap_poses.shape[0]
        n_tags = tag_poses.shape[0]
        cap_poses, tag_poses = apply_wave_seeds(
            camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
            seed_cap, seed_block, tag_init_blocks, aruco_size, seed_mode,
        )
        lin_fn, quality_fn = make_dist_block_hooks(
            mesh, cap_idx, tag_idx, corners, block_mask, aruco_size,
            n_caps, n_tags,
        )
        return lm_core(camera, cap_poses, tag_poses, cam_active, cap_active,
                       tag_active, lin_fn, quality_fn, config,
                       enabled=lm_enabled)

    return run


def lm_solve_dist(
    mesh,
    camera,
    cap_poses,
    tag_poses,
    cap_idx,
    tag_idx,
    corners,
    block_mask,
    cam_active,
    cap_active,
    tag_active,
    *,
    aruco_size: float,
    config: LMConfig = LMConfig(),
):
    """Distributed lm_solve: same contract as solve.lm.lm_solve but with the
    block axis sharded over ``mesh``.  Block arrays must have a leading axis
    divisible by the mesh size (see mesh.pad_blocks_to_multiple)."""
    n_caps = cap_poses.shape[0]
    n_tags = tag_poses.shape[0]

    @partial(jax.jit, static_argnames=())
    def run(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
            block_mask, cam_active, cap_active, tag_active):
        lin_fn, quality_fn = make_dist_block_hooks(
            mesh, cap_idx, tag_idx, corners, block_mask, aruco_size,
            n_caps, n_tags,
        )
        return lm_core(camera, cap_poses, tag_poses, cam_active, cap_active,
                       tag_active, lin_fn, quality_fn, config)

    return run(camera, cap_poses, tag_poses, cap_idx, tag_idx, corners,
               block_mask, cam_active, cap_active, tag_active)
