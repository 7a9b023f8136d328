"""Pallas TPU kernels: prefix sums and box filters.

XLA lowers ``jnp.cumsum`` over image axes to 128-tap depthwise convolutions
(~1.9 ms per cumsum on a 768x1020x8 batch — the adaptive threshold and the
corner-refinement field maps together spent ~21 ms/batch on them).  These
kernels run the whole inclusive prefix sum as log-doubling shift-adds inside
VMEM per tile (the same structure as pallas_ccl's segmented min scans):
~10 VMEM passes instead of 128 HBM-level taps.

Rows are independent for row scans (columns for column scans), so tiles
need no halo exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ar_slam_tpu.detect.pallas_ccl import _shift


def _sum_scan(x, axis):
    size = x.shape[axis]
    steps = int(np.ceil(np.log2(max(size, 2))))
    for k in range(steps):
        x = x + _shift(x, 1 << k, axis, 0.0)
    return x


def _row_kernel(x_ref, o_ref):
    o_ref[...] = _sum_scan(x_ref[...], axis=x_ref.ndim - 1)


def _col_kernel(x_ref, o_ref):
    o_ref[...] = _sum_scan(x_ref[...], axis=x_ref.ndim - 2)


def _scan_pass(x, axis, row_strip=256, col_strip=256, interpret=False):
    """Inclusive prefix sum along ``axis`` for a (N, H, W) f32 batch."""
    n, h, w = x.shape
    if axis == 2:
        strips = -(-h // row_strip)
        block = (1, row_strip, w)
        index_map = lambda i, j: (i, j, 0)  # noqa: E731
        kernel = _row_kernel
    else:
        strips = -(-w // col_strip)
        block = (1, h, col_strip)
        index_map = lambda i, j: (i, 0, j)  # noqa: E731
        kernel = _col_kernel
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(n, strips),
        in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _box_1d(x, win: int, axis: int, interpret: bool):
    """Edge-padded centered windowed sum along one axis via prefix-sum
    difference: box[i] = s[i + win - 1] - s[i - 1] over the padded array,
    with s[-1] = 0."""
    size = x.shape[axis]
    pad_cfg = [(0, 0), (0, 0), (0, 0)]
    pad_cfg[axis] = (win // 2, win // 2)
    padded = jnp.pad(x, pad_cfg, mode="edge")
    # align to kernel tiles (multiple of 8 rows / 128 lanes); zero padding
    # beyond the scan extent cannot corrupt prefix sums to its left
    n, h, w = padded.shape
    h_pad = -(-h // 8) * 8
    w_pad = -(-w // 128) * 128
    if (h_pad, w_pad) != (h, w):
        padded = jnp.pad(padded, ((0, 0), (0, h_pad - h), (0, w_pad - w)))
    s = _scan_pass(padded, axis, interpret=interpret)
    hi = jax.lax.slice_in_dim(s, win - 1, win - 1 + size, axis=axis)
    head = jax.lax.slice_in_dim(s, 0, 1, axis=axis)
    s_prev = jnp.concatenate(
        [jnp.zeros_like(head),
         jax.lax.slice_in_dim(s, 0, size - 1, axis=axis)], axis=axis)
    out = hi - s_prev
    # trim the tile padding on the other image axis
    other = 1 if axis == 2 else 2
    return jax.lax.slice_in_dim(out, 0, x.shape[other], axis=other)


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def box_sum_batch(imgs, win: int, interpret: bool = False):
    """(N, H, W) windowed (win x win) sums with edge padding — numerically
    equivalent to tpu_detect.box_mean * win**2 (same integral-image math,
    evaluated as two separable prefix-sum passes in VMEM)."""
    x = imgs.astype(jnp.float32)
    x = _box_1d(x, win, axis=2, interpret=interpret)
    x = _box_1d(x, win, axis=1, interpret=interpret)
    return x


def box_mean_batch(imgs, win: int, interpret: bool = False):
    return box_sum_batch(imgs, win, interpret=interpret) / float(win * win)
