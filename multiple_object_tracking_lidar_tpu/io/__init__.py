from multiple_object_tracking_lidar_tpu.io.pointcloud2 import (
    PointCloud2,
    PointField,
    decode_pointcloud2,
    make_pointcloud2,
)
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject

__all__ = [
    "PointCloud2",
    "PointField",
    "decode_pointcloud2",
    "make_pointcloud2",
    "Scenario",
    "ScenarioObject",
]
