from ar_slam_tpu.viz.export import camera_info, marker_array, transforms  # noqa: F401
from ar_slam_tpu.viz.annotate import annotate_capture  # noqa: F401
