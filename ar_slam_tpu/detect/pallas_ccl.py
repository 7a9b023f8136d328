"""Pallas TPU kernel: connected-component labeling resident in VMEM.

The XLA implementation (tpu_detect.connected_components) round-trips the
3 MB label image through HBM ~50 times (4 segmented scans + min-pool per
iteration).  A 768x1024 int32 image fits comfortably in VMEM, so this
kernel loads the binary mask ONCE, runs every propagation iteration
on-chip, and stores the final labels ONCE.

Propagation per iteration (identical semantics to the XLA version):
  - separable 3x3 min-pool over foreground (8-connectivity diagonal links)
  - full-run segmented min along rows and columns in both directions via
    log-step doubling: maintain (val, reach) where reach[i] says the last
    2^k cells ending at i are all foreground; combine with shifted copies.

Shifts are static pad+slice (lane/sublane shuffles on TPU).
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
    if delta > 0:
        pad[axis] = (delta, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
    else:
        pad[axis] = (0, -delta)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-delta, size - delta)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _run_min_scan(labels, fg_i32, axis):
    """Segmented min over each full foreground run along ``axis`` (both
    directions) via log-step doubling.  Masks are int32 0/1 — Mosaic cannot
    pad i1 vectors."""
    size = labels.shape[axis]
    steps = int(np.ceil(np.log2(size)))
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


def _ccl_compute(fg_i32, iters: int, h: int, w: int):
    """The propagation body (shared by the pallas kernel and tests).
    ``fg_i32``: int32 0/1 foreground mask."""
    fg = fg_i32 > 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(fg, idx, BIG)

    def one_iter(_, labels):
        # separable 3x3 min-pool (8-connectivity), foreground only
        m = jnp.minimum(jnp.minimum(labels, _shift(labels, 1, 1, BIG)),
                        _shift(labels, -1, 1, BIG))
        m = jnp.minimum(jnp.minimum(m, _shift(m, 1, 0, BIG)),
                        _shift(m, -1, 0, BIG))
        labels = jnp.where(fg, jnp.minimum(labels, m), BIG)
        labels = _run_min_scan(labels, fg_i32, axis=1)
        labels = _run_min_scan(labels, fg_i32, axis=0)
        return labels

    # fori_loop: the body is iteration-invariant, so Mosaic compiles it once
    # instead of unrolling iters copies
    return jax.lax.fori_loop(0, iters, one_iter, labels)


def _kernel(binary_ref, out_ref, *, iters: int, h: int, w: int):
    out_ref[:] = _ccl_compute(binary_ref[:], iters, h, w)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def connected_components_pallas(binary, iters: int = 8,
                                interpret: bool = False):
    """Label foreground pixels with the min linear index of their
    8-connected component; background gets BIG.  Whole image resident in
    VMEM for all iterations.

    Args:
      binary: (H, W) bool; W should be lane-friendly (multiple of 128 after
        internal padding).
    """
    h, w = binary.shape
    w_pad = -(-w // 128) * 128
    h_pad = -(-h // 8) * 8
    x = jnp.zeros((h_pad, w_pad), jnp.int32)
    x = x.at[:h, :w].set(binary.astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters, h=h_pad, w=w_pad),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    # padded linear indices use the padded width; remap to true-width
    # indices so downstream (sorting, extreme points) sees consistent ids
    out = out[:h, :w]
    row = jnp.where(out == BIG, 0, out) // w_pad
    col = jnp.where(out == BIG, 0, out) % w_pad
    remapped = row * w + jnp.minimum(col, w - 1)
    return jnp.where(out == BIG, jnp.int32(2**30), remapped.astype(jnp.int32))
