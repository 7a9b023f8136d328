"""Focal self-calibration estimator across its three data regimes.

The IAC constraints a·f² = b are noise-dominated for near-frontal tags,
and each naive aggregate fails differently (ratio-median with positivity
censoring: ~70% high; a²-weighted least squares: ~80% low — both were
measured failures that respectively stranded the 10k-tag construction and
the TPU demo solve in wrong-focal basins, round 4).  The estimator must
be accurate where signal exists and honest (None) where it doesn't.
"""

import numpy as np

from ar_slam_tpu.core.calib import estimate_focal
from ar_slam_tpu.utils.synthetic import make_synthetic_map

ARUCO_SIZE = 0.0635


def _rects(store):
    return (b.corners for b in store.blocks)


def test_estimate_focal_tilted_scene_accurate():
    """Genuine tilt diversity: the estimate lands within a few % of truth."""
    store, _ = make_synthetic_map(n_tags=100, n_caps=50, seed=1,
                                  noise_px=0.1, focal=1200.0,
                                  image_size=(1600, 1200), height=0.9)
    f = estimate_focal(_rects(store), ARUCO_SIZE)
    assert f is not None
    np.testing.assert_allclose(f, 1200.0, rtol=0.05)


def test_estimate_focal_near_frontal_not_grossly_biased():
    """The near-frontal 10k-style synthetic (true focal 3000): whatever the
    estimator returns must be either None (fallback to the reference init
    3000) or within the basin the batched construction provably converges
    from (README 10k-tag row) — NOT the old ratio-median's ~5200."""
    store, _ = make_synthetic_map(n_tags=200, n_caps=100, seed=0,
                                  noise_px=0.3)
    f = estimate_focal(_rects(store), ARUCO_SIZE)
    assert f is None or 2400.0 <= f <= 3600.0, f


def test_estimate_focal_small_real_dataset_regime():
    """Few constraints (the bundled demo has 15 blocks): the censored
    all-median path must stay close to truth, not attenuate toward zero
    like the least-squares aggregate did (338 vs ~760)."""
    import os

    import yaml

    from ar_slam_tpu.graph import MapStore

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "demo_detections.yaml")
    data = yaml.safe_load(open(fixture))
    store = MapStore()
    for cap in data["captures"][:3]:
        dets = [(d["id"], np.array(d["corners"]).reshape(4, 2))
                for d in cap["detections"]["4X4_50"]]
        store.add_detections(cap["uid"], dets,
                             (cap["width"], cap["height"]), cap["img_fn"])
    f = estimate_focal(_rects(store), ARUCO_SIZE)
    assert f is not None and 550.0 <= f <= 1100.0, f


def test_estimate_focal_empty():
    assert estimate_focal(iter(()), ARUCO_SIZE) is None
