from lio_slam_tpu.utils import se3 as se3  # noqa: F401
from lio_slam_tpu.utils import pointcloud as pointcloud  # noqa: F401
