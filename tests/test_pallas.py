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


@pytest.mark.slow
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


def test_pallas_ccl_fused_matches_xla():
    """The whole-image-resident fused kernel (in-kernel fixpoint loop,
    per-image early exit) labels identically to the XLA path on a batch
    mixing blobs, a ring, a serpentine (slow-converging) border, noise,
    and an all-background frame, at a non-aligned size."""
    from ar_slam_tpu.detect.pallas_ccl import connected_components_fused_batch

    rng = np.random.default_rng(0)
    h, w = 61, 150
    img = np.zeros((h, w), bool)
    img[5:20, 5:25] = True
    img[25:50, 30:60] = True
    img[30:45, 35:55] = False  # ring
    for i, r in enumerate(range(4, 52, 8)):  # serpentine
        img[r, 70:140] = True
        if r + 8 < 52:
            img[r:r + 9, 70 if i % 2 else 139] = True
    img |= rng.random((h, w)) < 0.08
    batch = np.stack([img, rng.random((h, w)) < 0.3, np.zeros((h, w), bool)])

    import jax
    ref = jax.vmap(lambda b: connected_components(b, 64))(jnp.asarray(batch))
    got = connected_components_fused_batch(jnp.asarray(batch), iters=64,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_extract_matches_xla():
    """Extreme-point quads from the pallas kernel == the XLA (K, P)
    formulation on a multi-component frame (argmax tie-breaks included)."""
    from ar_slam_tpu.detect.pallas_extract import extreme_quads_pallas
    from ar_slam_tpu.detect.tpu_detect import (
        _extreme_quads,
        _top_k_components,
    )
    import jax

    img = np.zeros((64, 160), bool)
    img[4:20, 8:40] = True
    img[8:16, 12:36] = False      # ring (marker-border-like)
    img[30:60, 60:120] = True
    img[36:54, 66:114] = False
    img[5:9, 130:150] = True      # small solid blob
    labels = np.asarray(connected_components(jnp.asarray(img), 6))
    k = 8
    roots, areas = jax.jit(
        lambda l: _top_k_components(l.reshape(-1), k, img.shape[1])
    )(jnp.asarray(labels))
    qx = _extreme_quads(jnp.asarray(labels).reshape(-1), roots, *img.shape)
    qp = extreme_quads_pallas(jnp.asarray(labels)[None],
                              jnp.asarray(roots)[None], k=k, strip=16,
                              interpret=True)[0]
    valid = np.asarray(areas) > 0
    np.testing.assert_allclose(np.asarray(qp)[valid], np.asarray(qx)[valid])


def test_pallas_box_matches_integral_image():
    """box_sum_batch == box_mean * win^2 (the XLA integral-image path) for
    odd-sized images and both window sizes used by the pipeline."""
    from ar_slam_tpu.detect.pallas_box import box_sum_batch
    from ar_slam_tpu.detect.tpu_detect import box_mean

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 255, size=(2, 37, 141)).astype(np.float32)
    for win in (11, 23):
        ref = np.stack([
            np.asarray(box_mean(jnp.asarray(im), win)) * win * win
            for im in imgs
        ])
        got = np.asarray(box_sum_batch(jnp.asarray(imgs), win,
                                       interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-2)
