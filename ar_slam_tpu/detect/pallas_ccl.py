"""Pallas TPU kernels: connected-component labeling propagation.

The XLA implementation (tpu_detect.connected_components) lowers each
log-doubling step of the segmented scans as separate HBM-level ops
(~240 MB of HBM traffic per iteration for a 768x1024 image).  These kernels
run a whole scan — all ~10 doubling steps — inside VMEM per tile:

- row kernel: tiles of full rows; segmented min over each foreground run
  along the row axis (both directions), doubling in-register.
- col kernel: tiles of full columns; same along the column axis.

Rows are independent for row scans (and columns for column scans), so the
tiles need no halo exchange.  The 3x3 min-pool between scans (diagonal
links of 8-connectivity) stays an XLA reduce_window (single fused pass).

Per CCL iteration: 2 pallas calls + 1 pool ≈ 24 MB HBM traffic vs ~240 MB
for the pure-XLA path.

Foreground is encoded in the labels themselves (label < BIG), so the
kernels take only the label image.  Masks are int32 — Mosaic cannot pad i1
vectors — and loops over doubling steps are unrolled only log2(axis) times.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(2**30)


def _shift(x, delta, axis, fill):
    """Shift x by +delta along axis (values move toward higher indices),
    filling vacated cells — static pad+slice."""
    if delta == 0:
        return x
    size = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if delta > 0:
        pad[axis] = (delta, 0)
        sl[axis] = slice(0, size)
    else:
        pad[axis] = (0, -delta)
        sl[axis] = slice(-delta, size - delta)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _run_min_scan(labels, axis):
    """Segmented min over each full foreground run along ``axis`` (both
    directions) via log-step doubling; foreground = label < BIG."""
    size = labels.shape[axis]
    steps = int(np.ceil(np.log2(size)))
    fg_i32 = (labels < BIG).astype(jnp.int32)
    for direction in (+1, -1):
        val = labels
        reach = fg_i32
        for k in range(steps):
            span = direction * (1 << k)
            sval = _shift(val, span, axis, BIG)
            sreach = _shift(reach, span, axis, 0)
            val = jnp.where(reach > 0, jnp.minimum(val, sval), val)
            reach = reach * sreach
        labels = jnp.minimum(labels, val)
    return labels


def _row_kernel(l_ref, o_ref):
    o_ref[...] = _run_min_scan(l_ref[...], axis=l_ref.ndim - 1)


def _col_kernel(l_ref, o_ref):
    o_ref[...] = _run_min_scan(l_ref[...], axis=l_ref.ndim - 2)


def _scan_pass(labels, axis, row_strip=128, col_strip=256, interpret=False):
    """One full segmented-scan pass over the batch via a tiled kernel.

    labels: (N, H, W) int32.
    """
    n, h, w = labels.shape
    if axis == 2:  # rows
        strips = -(-h // row_strip)
        block = (1, row_strip, w)
        index_map = lambda i, j: (i, j, 0)  # noqa: E731
        kernel = _row_kernel
        grid = (n, strips)
    else:  # columns
        strips = -(-w // col_strip)
        block = (1, h, col_strip)
        index_map = lambda i, j: (i, 0, j)  # noqa: E731
        kernel = _col_kernel
        grid = (n, strips)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(labels.shape, jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(labels)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def connected_components_pallas_batch(binary, iters: int = 8,
                                      interpret: bool = False):
    """Label foreground pixels with the min linear index of their
    8-connected component; background gets BIG.

    Args:
      binary: (N, H, W) bool.
    """
    n, h, w = binary.shape
    w_pad = -(-w // 128) * 128
    h_pad = -(-h // 8) * 8
    fg = jnp.zeros((n, h_pad, w_pad), bool)
    fg = fg.at[:, :h, :w].set(binary)

    idx = (jax.lax.broadcasted_iota(jnp.int32, (h_pad, w_pad), 0) * w_pad
           + jax.lax.broadcasted_iota(jnp.int32, (h_pad, w_pad), 1))
    labels = jnp.where(fg, idx[None], BIG)

    def one_iter(labels):
        # 3x3 min-pool (8-connectivity diagonal links) — one fused XLA pass
        neigh = -jax.lax.reduce_window(
            -labels, -BIG, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )
        labels = jnp.where(fg, jnp.minimum(labels, neigh), BIG)
        labels = _scan_pass(labels, axis=2, interpret=interpret)
        labels = _scan_pass(labels, axis=1, interpret=interpret)
        return labels

    # iterate to fixpoint with early exit (bounded by ``iters``): typical
    # frames converge in fewer rounds than the worst-case spiral, and
    # stopping on no-change is strictly more converged than a fixed count
    def cond(state):
        i, labels, changed = state
        return (i < iters) & changed

    def body(state):
        i, labels, _ = state
        new = one_iter(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.asarray(True))
    )

    # remap padded-width linear indices to true-width ids
    labels = labels[:, :h, :w]
    row = jnp.where(labels == BIG, 0, labels) // w_pad
    col = jnp.where(labels == BIG, 0, labels) % w_pad
    remapped = row * w + jnp.minimum(col, w - 1)
    return jnp.where(labels == BIG, jnp.int32(2**30),
                     remapped.astype(jnp.int32))


def connected_components_pallas(binary, iters: int = 8,
                                interpret: bool = False):
    """Single-image convenience wrapper around the batched kernel."""
    return connected_components_pallas_batch(binary[None], iters=iters,
                                             interpret=interpret)[0]
