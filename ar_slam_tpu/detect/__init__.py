from ar_slam_tpu.detect.dictionaries import get_dictionary, DICT_NAMES  # noqa: F401
from ar_slam_tpu.detect.reference import detect_markers  # noqa: F401
