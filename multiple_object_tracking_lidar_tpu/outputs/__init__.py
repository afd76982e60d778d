from multiple_object_tracking_lidar_tpu.outputs.messages import (
    Obstacle,
    ObstacleArray,
    MarkerArray,
    TextMarker,
    PoseMarkerCloud,
    build_outputs,
)

__all__ = [
    "Obstacle",
    "ObstacleArray",
    "MarkerArray",
    "TextMarker",
    "PoseMarkerCloud",
    "build_outputs",
]
