from ar_slam_tpu.pipeline.ingest import ImageIngest, load_image  # noqa: F401
from ar_slam_tpu.pipeline.merge import MergeDetections  # noqa: F401
from ar_slam_tpu.pipeline.engine import ArSlamEngine  # noqa: F401
