"""Pallas kernel tests (interpret mode on CPU): exact parity with the XLA
reference implementations.

Interpret mode executes per-op, so cases are kept small; the full-size
check runs on real TPU via bench/tools (see pallas_ccl docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ar_slam_tpu.detect.pallas_ccl import connected_components_pallas
from ar_slam_tpu.detect.tpu_detect import connected_components


def test_pallas_ccl_matches_xla_blobs_and_ring():
    img = np.zeros((32, 128), bool)
    img[2:10, 4:16] = True
    img[12:30, 20:60] = True
    img[16:26, 24:56] = False  # ring
    img[4:8, 90:120] = True
    lp = np.asarray(connected_components_pallas(jnp.asarray(img), iters=4,
                                                interpret=True))
    lx = np.asarray(connected_components(jnp.asarray(img), 4))
    np.testing.assert_array_equal(lp, lx)


def test_pallas_ccl_nonaligned_width():
    """W not a multiple of 128 exercises the pad + linear-index remap, and
    the diagonal staircase exercises 8-connectivity."""
    img = np.zeros((33, 97), bool)
    img[4:20, 5:60] = True
    for i in range(10):
        img[22 + i % 8, 70 + i * 2: 72 + i * 2] = True
    lp = np.asarray(connected_components_pallas(jnp.asarray(img), iters=4,
                                                interpret=True))
    lx = np.asarray(connected_components(jnp.asarray(img), 4))
    np.testing.assert_array_equal(lp, lx)
