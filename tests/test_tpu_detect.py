"""Batched dense (TPU-style) detector tests: stage correctness + demo-image
parity + end-to-end map quality from our own detections."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from ar_slam_tpu.config import ArSlamConfig
from ar_slam_tpu.detect.gen import render_marker
from ar_slam_tpu.detect.tpu_detect import (
    DetectParams,
    adaptive_threshold,
    connected_components,
    detect_batch,
    otsu_batch,
)
from ar_slam_tpu.graph import MapStore
from ar_slam_tpu.solve import solve_batch

from tests.test_detect import place_marker

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def demo_images():
    with open(os.path.join(FIXTURES, "demo_detections.yaml")) as f:
        data = yaml.safe_load(f)
    imgs = np.stack([
        np.asarray(Image.open(c["img_fn"]).convert("L"))
        for c in data["captures"]
    ])
    return data, imgs


def test_connected_components_two_blobs():
    img = np.zeros((32, 32), bool)
    img[4:10, 4:10] = True
    img[20:28, 18:30] = True
    labels = np.asarray(connected_components(jnp.asarray(img), 8))
    l1 = labels[5, 5]
    l2 = labels[22, 22]
    assert l1 != l2
    assert (labels[4:10, 4:10] == l1).all()
    assert (labels[20:28, 18:30] == l2).all()
    assert (labels[img == 0] >= 2**30).all()


def test_connected_components_ring():
    """Hollow ring (what adaptive threshold makes of big markers) labels as
    one component."""
    img = np.zeros((64, 64), bool)
    img[10:50, 10:50] = True
    img[16:44, 16:44] = False
    labels = np.asarray(connected_components(jnp.asarray(img), 24))
    fg = labels[img]
    assert (fg == fg[0]).all()


def test_otsu_batch_bimodal():
    v = np.concatenate([np.full(100, 10.0), np.full(100, 250.0)])
    rows = np.stack([v, v + 2])
    t = np.asarray(otsu_batch(jnp.asarray(rows)))
    assert np.all((t > 10) & (t < 250))


def test_adaptive_threshold_matches_oracle():
    from ar_slam_tpu.detect.reference import adaptive_threshold as oracle_at

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(96, 128)).astype(np.float32)
    ours = np.asarray(adaptive_threshold(jnp.asarray(img), 23, 7.0))
    ref = oracle_at(img, 23, 7.0)
    assert (ours == ref).mean() > 0.999


def test_rendered_batch_detection():
    canvases = []
    expected = []
    rng = np.random.default_rng(1)
    for i in range(3):
        canvas = np.full((480, 640), 200, dtype=np.uint8)
        mid = int(rng.integers(0, 50))
        quad = np.array([[150, 100], [390, 120], [380, 350], [160, 330]],
                        float) + rng.uniform(-20, 20, size=(4, 2))
        place_marker(canvas, render_marker("4X4_50", mid, 168), quad)
        canvases.append(canvas)
        expected.append(mid)
    out = detect_batch(jnp.asarray(np.stack(canvases)),
                       dict_names=("4X4_50",))
    ids = np.asarray(out["4X4_50"]["ids"])
    valid = np.asarray(out["4X4_50"]["valid"])
    for i in range(3):
        got = ids[i][valid[i]]
        assert list(got) == [expected[i]], (i, got, expected[i])


def test_demo_batch_id_parity():
    data, imgs = demo_images()
    out = detect_batch(jnp.asarray(imgs))
    for name in ("4X4_50", "5X5_100"):
        ids = np.asarray(out[name]["ids"])
        valid = np.asarray(out[name]["valid"])
        for i, cap in enumerate(data["captures"]):
            got = sorted(int(x) for x in ids[i][valid[i]])
            oracle = sorted(int(d["id"].split("_")[-1])
                            for d in cap["detections"][name])
            assert got == oracle, (cap["uid"], name, got, oracle)


def test_multi_window_dedup():
    """Two threshold windows produce the same markers once (duplicate
    suppression keeps one instance per marker)."""
    data, imgs = demo_images()
    out = detect_batch(jnp.asarray(imgs[:1]),
                       params=DetectParams(win_sizes=(23, 13)),
                       dict_names=("4X4_50",))
    ids = np.asarray(out["4X4_50"]["ids"][0])
    valid = np.asarray(out["4X4_50"]["valid"][0])
    got = sorted(int(i) for i in ids[valid])
    assert got == [18, 20, 21, 22, 23], got  # each exactly once


def test_demo_own_detections_map_quality():
    """Full TPU-native front end + solver: map RMSE from OUR detections must
    be sub-0.4px (beats the cv2-fixture 0.46px)."""
    data, imgs = demo_images()
    h, w = imgs.shape[1:]
    out = detect_batch(jnp.asarray(imgs))
    store = MapStore()
    for i in range(3):
        dets = []
        for name in ("4X4_50", "5X5_100"):
            ids = np.asarray(out[name]["ids"][i])
            corners = np.asarray(out[name]["corners"][i])
            valid = np.asarray(out[name]["valid"][i])
            for k in np.nonzero(valid)[0]:
                dets.append((f"aruco_{name}_{int(ids[k])}",
                             corners[k] - np.array([w / 2, h / 2])))
        store.add_detections(f"cap_{i}", dets, (w, h))
    summary = solve_batch(store, ArSlamConfig(), dtype=np.float64)
    # chip (f32 — dtype=float64 downcasts without x64): the same solve
    # lands at ~0.45 px; still far inside the documented 0.32-0.55 band
    # and an order of magnitude under the reference's ~10 px basin
    import jax as _jax

    bound = 0.4 if _jax.config.jax_enable_x64 else 0.55
    assert summary["rmse"] < bound, summary


def test_rendered_batch_6x6():
    """The batched device detector decodes 6X6_250 markers (grid size and
    dictionary table are data, not code — same kernel)."""
    canvas = np.full((480, 640), 200, dtype=np.uint8)
    quad = np.array([[170, 110], [410, 140], [395, 355], [185, 335]], float)
    place_marker(canvas, render_marker("6X6_250", 201, 160), quad)
    out = detect_batch(jnp.asarray(canvas[None]), dict_names=("6X6_250",))
    ids = np.asarray(out["6X6_250"]["ids"][0])
    valid = np.asarray(out["6X6_250"]["valid"][0])
    assert list(ids[valid]) == [201]
    corners = np.asarray(out["6X6_250"]["corners"][0][valid][0])
    assert np.abs(corners - quad).max() < 2.5


def test_topk_min_pool_keeps_thin_rings():
    """A 1-px ring lying entirely on odd rows/columns must survive the
    subsampled top-k ranking (min-pooling, not plain striding — plain
    [::2, ::2] would drop it entirely)."""
    from ar_slam_tpu.detect.tpu_detect import _top_k_subsampled

    img = np.zeros((40, 160), bool)
    # 1-px ring with every pixel on an odd row or odd column
    img[5, 7:19] = True    # top edge: row 5 (odd)
    img[15, 7:19] = True   # bottom edge: row 15 (odd)
    img[5:16, 7] = True    # left edge: col 7 (odd)
    img[5:16, 17] = True   # right edge: col 17 (odd)
    labels = connected_components(jnp.asarray(img), 6)
    roots, areas = _top_k_subsampled(labels, 4, 2)
    roots = np.asarray(roots)
    true_root = int(np.asarray(labels)[img].min())
    assert true_root in roots[np.asarray(areas) > 0], (roots, areas)


def test_clutter_does_not_evict_markers():
    """A scene with MORE large filled distractor blobs than the candidate
    budget must still detect the markers: pure-area ranking would evict
    the hollow marker rings (a filled blob of the same footprint has far
    more pixels) — the ring-aware score (area x hollowness) plus the
    oversized-component demotion keep them in the top-k."""
    rng = np.random.default_rng(5)
    canvas = np.full((960, 1280), 200, np.uint8)
    # two markers, ~110 px
    q1 = np.array([[80, 80], [190, 84], [186, 192], [78, 188]], float)
    q2 = np.array([[1050, 700], [1160, 706], [1154, 812], [1046, 808]],
                  float)
    place_marker(canvas, render_marker("4X4_50", 7, 96), q1)
    place_marker(canvas, render_marker("4X4_50", 21, 96), q2)
    # 40 filled dark blobs, each with MORE pixels than a marker ring
    # (ring area of a 110 px marker ~ 4*110*18 ~ 8k px; blobs are 10k px)
    k_budget = 24  # fewer slots than distractors
    placed = 0
    for _ in range(400):
        if placed >= 40:
            break
        y = int(rng.integers(0, 860))
        x = int(rng.integers(0, 1180))
        h_, w_ = 100, 100
        # keep clear of the markers
        if (y < 260 and x < 260) or (y > 620 and x > 960):
            continue
        canvas[y:y + h_, x:x + w_] = 30
        placed += 1
    assert placed >= 40
    out = detect_batch(
        jnp.asarray(canvas[None]),
        params=DetectParams(max_candidates=k_budget),
        dict_names=("4X4_50",),
    )
    ids = np.asarray(out["4X4_50"]["ids"][0])
    valid = np.asarray(out["4X4_50"]["valid"][0])
    got = sorted(int(i) for i in ids[valid])
    assert got == [7, 21], got


def test_serpentine_ccl_converges_at_default_iters():
    """High-bend (serpentine) foreground converges within the DEFAULT
    ccl_iters bound — the early-exit fixpoint loop makes a generous bound
    free for typical images, so under-merging cannot happen silently."""
    img = np.zeros((96, 96), bool)
    # serpentine: horizontal bars connected alternately left/right
    for i, y in enumerate(range(4, 92, 6)):
        img[y, 4:92] = True
        if y + 6 < 92:
            if i % 2 == 0:
                img[y:y + 7, 90] = True
            else:
                img[y:y + 7, 4] = True
    labels = np.asarray(connected_components(
        jnp.asarray(img), DetectParams().ccl_iters))
    fg = labels[img]
    assert (fg == fg[0]).all(), "serpentine under-merged at default iters"


def test_noise_speckle_does_not_decode():
    """Precision guard (round-5 FP lab): pure pixel-noise patches must not
    decode as markers.  Otsu slicing a textureless patch yields ~random
    bits, and 16-bit hamming-0 chance matches are certain at corpus scale
    (~2^-16 x ids x rotations per candidate); the min_otsu_std=12 +
    min_cell_px gates exist exactly for this.  A real marker in the same
    noisy scene must still decode."""
    rng = np.random.default_rng(11)
    canvas = np.full((768, 1024), 190, np.float64)
    q = np.array([[460, 330], [570, 334], [566, 442], [458, 438]], float)
    canvas_u8 = canvas.astype(np.uint8)
    place_marker(canvas_u8, render_marker("4X4_50", 13, 96), q)
    noisy = np.clip(canvas_u8 + rng.normal(scale=10.0, size=canvas.shape),
                    0, 255).astype(np.uint8)
    out = detect_batch(
        jnp.asarray(noisy[None]),
        params=DetectParams(win_sizes=(3, 13, 23), max_candidates=64),
        dict_names=("4X4_50", "5X5_100"),
    )
    for name in ("4X4_50", "5X5_100"):
        ids = np.asarray(out[name]["ids"][0])
        valid = np.asarray(out[name]["valid"][0])
        got = sorted(int(i) for i in ids[valid])
        if name == "4X4_50":
            assert got == [13], got  # the real marker, nothing else
        else:
            assert got == [], got  # no chance-match on the noise field
