"""ar_slam_tpu — a TPU-native AR-tag SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``dbking77/ar_slam`` ROS 2 package (structure-from-motion over a bipartite
capture–tag constraint graph with shared camera intrinsics):

- ``ar_slam_tpu.core``    — geometry, camera model, reprojection residuals (pure jnp)
- ``ar_slam_tpu.graph``   — host-side constraint-graph store + map.yaml checkpoint IO
- ``ar_slam_tpu.solve``   — Levenberg–Marquardt with Schur elimination of tag blocks
- ``ar_slam_tpu.detect``  — batched Aruco detection (NumPy oracle + Pallas TPU kernels)
- ``ar_slam_tpu.parallel``— multi-chip/multi-host distributed bundle adjustment
- ``ar_slam_tpu.pipeline``— async ingest → detect → merge → incremental-solve pipeline
- ``ar_slam_tpu.viz``     — headless debug annotation + pose/intrinsics artifact export
"""

__version__ = "0.1.0"

from ar_slam_tpu.config import ArSlamConfig  # noqa: F401
