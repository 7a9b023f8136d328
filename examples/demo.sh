#!/usr/bin/env bash
# End-to-end demo (≙ ros2 launch ar_slam demo_launch.py):
# build the 6-tag map from img1-3, localize img4 against it, and write
# annotated debug images — using the reference's bundled demo photos.
set -euo pipefail

IMGS=/root/reference/ar_slam/resources/images
OUT=${1:-/tmp/ar_slam_demo}
mkdir -p "$OUT"

echo "== mapping img1-3 -> $OUT/map.yaml"
arslam map "$IMGS"/img1.jpg "$IMGS"/img2.jpg "$IMGS"/img3.jpg \
    -o "$OUT/map.yaml"

echo "== localizing img4 (partially occluded tag) -> $OUT/localize.yaml"
arslam localize "$OUT/map.yaml" "$IMGS"/img4.jpg -o "$OUT/localize.yaml"

echo "== annotated overlays -> $OUT/annotated/"
arslam annotate "$OUT/localize.yaml" --out-dir "$OUT/annotated" --all-tags

echo "== reprojection audit (worst blocks first)"
arslam audit "$OUT/localize.yaml" --limit 10

echo "== 3-D scene render -> $OUT/scene.png"
arslam scene "$OUT/map.yaml" -o "$OUT/scene.png"

echo "== streaming mode demo: watch a directory (ctrl-c to stop)"
echo "   arslam serve --watch photos/ -o map.yaml"
echo "   (drop images into photos/ — the load_images client equivalent)"

ls -la "$OUT" "$OUT/annotated"
