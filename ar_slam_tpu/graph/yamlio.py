"""map.yaml checkpoint IO — the reference's durable-checkpoint surface.

Schema identical to ``ArSlamSolver::saveYaml`` / ``loadYaml``
(ar_slam_util.cpp:304-465; layout documented in SURVEY.md §2.4):

    blocks:                      # list, one per observation
      - capture: <capture_uid>
        aruco: <aruco_id>
        aruco_rect: [x0, y0, x1, y1, x2, y2, x3, y3]   # flow seq
    captures:
      <uid>: {inv_pose: [tx,ty,tz,rx,ry,rz], img_fn: <path>}
    arucos:
      <id>: {pose: [tx,ty,tz,rx,ry,rz]}
    camera: {params: [focal, l1, l2], width: <int>, height: <int>}

Loading is additive and re-enterable (multiple files extend one store);
a duplicate capture uid raises, matching ar_slam_util.cpp:311-315.
"""

from __future__ import annotations

import io

import numpy as np
import yaml

from ar_slam_tpu.graph.store import MapStore


def load_yaml(store: MapStore, fn_or_stream) -> None:
    """Additively restore a map checkpoint into ``store``.

    Load order matches the reference loader (captures, arucos, blocks,
    camera — ar_slam_util.cpp:304-368) so index assignment is identical.
    """
    if hasattr(fn_or_stream, "read"):
        doc = yaml.safe_load(fn_or_stream)
    else:
        with open(fn_or_stream) as f:
            doc = yaml.safe_load(f)

    for uid, cap_data in (doc.get("captures") or {}).items():
        cap = store.add_capture(str(uid), str(cap_data.get("img_fn", "")))
        cap.inv_pose = np.asarray(cap_data["inv_pose"], dtype=float).copy()

    for tag_id, ar_data in (doc.get("arucos") or {}).items():
        tag = store.add_aruco(str(tag_id))
        tag.pose = np.asarray(ar_data["pose"], dtype=float).copy()

    for block_data in doc.get("blocks") or []:
        cap_idx = store.capture_map[str(block_data["capture"])]
        tag_idx = store.aruco_map[str(block_data["aruco"])]
        rect = np.asarray(block_data["aruco_rect"], dtype=float)
        if rect.size != 8:
            raise ValueError("aruco_rect has wrong number of values")
        store.add_block(rect.reshape(4, 2), cap_idx, tag_idx)

    cam = doc.get("camera")
    if cam:
        if "width" in cam and "height" in cam:
            store.camera.size = (int(cam["width"]), int(cam["height"]))
        params = np.asarray(cam["params"], dtype=float)
        store.camera.params[: params.size] = params
        store.camera.focal_calibrated = True


def _flow(seq) -> str:
    return "[" + ", ".join(_fmt(v) for v in seq) + "]"


def _fmt(v: float) -> str:
    """Float formatting: repr-style shortest round-trip, like yaml-cpp doubles."""
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return repr(float(v))


def dumps_yaml(store: MapStore) -> str:
    """Serialize in the reference section order: blocks, captures, arucos,
    camera (ar_slam_util.cpp:371-465)."""
    out = io.StringIO()
    out.write("blocks:\n")
    for block in store.blocks:
        cap = store.captures[block.cap_idx]
        tag = store.arucos[block.tag_idx]
        out.write(f"  - capture: {cap.uid}\n")
        out.write(f"    aruco: {tag.id}\n")
        out.write(f"    aruco_rect: {_flow(block.corners.reshape(-1))}\n")
    out.write("captures:\n")
    for cap in store.captures:
        out.write(f"  {cap.uid}:\n")
        out.write(f"    inv_pose: {_flow(cap.inv_pose)}\n")
        out.write(f"    img_fn: {cap.img_fn}\n")
    out.write("arucos:\n")
    for tag in store.arucos:
        out.write(f"  {tag.id}:\n")
        out.write(f"    pose: {_flow(tag.pose)}\n")
    out.write("camera:\n")
    out.write(f"  params: {_flow(store.camera.params)}\n")
    if store.camera.size is not None:
        out.write(f"  width: {store.camera.size[0]}\n")
        out.write(f"  height: {store.camera.size[1]}\n")
    return out.getvalue()


def save_yaml(store: MapStore, fn_or_stream) -> None:
    text = dumps_yaml(store)
    if hasattr(fn_or_stream, "write"):
        fn_or_stream.write(text)
    else:
        with open(fn_or_stream, "w") as f:
            f.write(text)
