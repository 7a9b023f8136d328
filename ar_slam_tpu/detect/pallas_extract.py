"""Pallas TPU kernel: per-candidate extreme-point quad extraction.

The XLA formulation (tpu_detect.extract_candidates) materializes a
(K, H*W) membership matrix and runs ~6 masked reductions over it — ~16 ms
of HBM traffic per 8-image batch.  Here the label image sits in VMEM once
per image and each (image, candidate) grid step runs four masked sweeps
over row strips entirely on-chip:

  sweep 0: area + centroid of the candidate's component
  sweep 1: A = member pixel farthest from the centroid
  sweep 2: C = member pixel farthest from A
  sweep 3: B, D = extreme member pixels either side of line AC

For a perspective-projected square (the marker border component) these are
exactly its four corners — the same math as the XLA path, which remains
the fallback for CPU and for images too large for VMEM residence.

Argmax tie-breaking matches jnp.argmax (first flat index): every sweep
carries (best score, min linear index at best).  Linear indices stay below
2^24 for VMEM-resident images, so f32 carries are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(2**30)
NEG = np.float32(-3.0e38)
POS = np.float32(3.0e38)

# largest label image kept VMEM-resident (bytes); larger falls back to XLA
VMEM_LABEL_LIMIT = 10 * 1024 * 1024


def _extract_kernel(roots_ref, l_ref, o_ref, *, strip: int):
    n = pl.program_id(0)
    k = pl.program_id(1)
    root = roots_ref[n, k]
    _, h, w = l_ref.shape
    n_strips = h // strip

    def masked(s, score_fn):
        """(member, score, lin) tiles for strip s."""
        lab = l_ref[0, pl.ds(s * strip, strip), :]
        member = lab == root
        # Mosaic iota must be integer-typed; cast after
        x = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 1).astype(
            jnp.float32)
        y = (jnp.float32(s * strip)
             + jax.lax.broadcasted_iota(jnp.int32, (strip, w), 0).astype(
                 jnp.float32))
        lin = y * jnp.float32(w) + x
        return member, score_fn(x, y), lin

    # sweep 0 (full image): area + centroid + row extent.  Later sweeps
    # only visit strips intersecting [ymin, ymax] — markers are small
    # relative to the frame, so this cuts most of the per-candidate work.
    def sums(s, carry):
        area, sx, sy, ymin, ymax = carry
        lab = l_ref[0, pl.ds(s * strip, strip), :]
        member = lab == root
        x = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 1).astype(
            jnp.float32)
        y = (jnp.float32(s * strip)
             + jax.lax.broadcasted_iota(jnp.int32, (strip, w), 0).astype(
                 jnp.float32))
        mf = member.astype(jnp.float32)
        ymin = jnp.minimum(ymin, jnp.min(jnp.where(member, y, POS)))
        ymax = jnp.maximum(ymax, jnp.max(jnp.where(member, y, NEG)))
        return (area + jnp.sum(mf), sx + jnp.sum(mf * x),
                sy + jnp.sum(mf * y), ymin, ymax)

    area, sx, sy, ymin, ymax = jax.lax.fori_loop(
        0, n_strips, sums,
        (jnp.float32(0), jnp.float32(0), jnp.float32(0), POS, NEG))
    safe = jnp.maximum(area, 1.0)
    cx, cy = sx / safe, sy / safe
    # strip range covering the component (empty slot -> empty range)
    s_lo = jnp.where(area > 0, ymin, 0.0).astype(jnp.int32) // strip
    s_hi = jnp.where(area > 0,
                     ymax.astype(jnp.int32) // strip + 1,
                     jnp.int32(0))

    def arg_extreme(score_fn, maximize=True):
        """Arg-extreme of score over member pixels -> (x, y); scans only
        the strips the component touches."""

        def body(s, carry):
            best, bl = carry
            member, score, lin = masked(s, score_fn)
            sc = jnp.where(member, score, NEG if maximize else POS)
            m = jnp.max(sc) if maximize else jnp.min(sc)
            lin_s = jnp.min(jnp.where(member & (sc == m), lin, POS))
            better = m > best if maximize else m < best
            bl = jnp.where(better, lin_s,
                           jnp.where(m == best, jnp.minimum(bl, lin_s), bl))
            best = jnp.maximum(best, m) if maximize else jnp.minimum(best, m)
            return best, bl

        init = (NEG, POS) if maximize else (POS, POS)
        _, bl = jax.lax.fori_loop(s_lo, s_hi, body, init)
        # empty component (padding slot): pixel (0, 0), like the XLA
        # path's argmax over an all-masked row
        bl = jnp.where(bl >= POS, 0.0, bl)
        return jnp.mod(bl, w), jnp.floor(bl / w)

    ax, ay = arg_extreme(lambda x, y: (x - cx) ** 2 + (y - cy) ** 2)
    ccx, ccy = arg_extreme(lambda x, y: (x - ax) ** 2 + (y - ay) ** 2)
    nx = -(ccy - ay)
    ny = ccx - ax
    sdist = lambda x, y: nx * (x - ax) + ny * (y - ay)  # noqa: E731
    bx, by = arg_extreme(sdist)
    dx, dy = arg_extreme(sdist, maximize=False)

    # Mosaic cannot store scalars to VMEM — build the full (8, 128) output
    # tile with masked selects and store it in one vector write
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tile = jnp.zeros((8, 128), jnp.float32)
    for c, v in enumerate((ax, ay, bx, by, ccx, ccy, dx, dy)):
        tile = jnp.where((row == 0) & (col == c), v, tile)
    o_ref[0, 0] = tile


@functools.partial(jax.jit, static_argnames=("k", "strip", "interpret"))
def extreme_quads_pallas(labels, roots, k: int, strip: int = 128,
                         interpret: bool = False):
    """Extreme-point quads for the top-k component roots of each image.

    Args:
      labels: (N, H, W) int32 component labels (BIG = background).
      roots: (N, K) int32 candidate root labels (BIG = empty slot).

    Returns:
      (N, K, 4, 2) float32 corner points [A, B, C, D] (hull order as in
      tpu_detect.extract_candidates before ordering/expansion).
    """
    n, h, w = labels.shape
    h_pad = -(-h // strip) * strip
    w_pad = -(-w // 128) * 128
    if (h_pad, w_pad) != (h, w):
        lab = jnp.full((n, h_pad, w_pad), BIG, jnp.int32)
        lab = lab.at[:, :h, :w].set(labels)
    else:
        lab = labels
    # the kernel's linear indices live in the padded frame but are only
    # decoded back to (x, y) pixel coordinates, never compared to labels,
    # so padding the frame is safe.
    out = _call(lab, roots, k, strip, interpret)
    return out[:, :, 0, :8].reshape(n, k, 4, 2)


def _call(lab, roots, k, strip, interpret):
    n, h_pad, w_pad = lab.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, k),
        in_specs=[
            pl.BlockSpec((1, h_pad, w_pad), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # output tile (8, 128): Mosaic requires the trailing block dims be
        # (multiple of 8, 128); only [0, :8] of each tile is meaningful
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_extract_kernel, strip=strip),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, k, 8, 128), jnp.float32),
        interpret=interpret,
    )(roots, lab)
