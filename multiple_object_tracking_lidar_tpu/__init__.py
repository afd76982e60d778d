"""TPU-native multi-object LiDAR tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MLCS-Yonsei/multiple-object-tracking-lidar (a ROS1/PCL/Eigen C++ node):
voxel downsampling, occupancy-grid static-point removal, Euclidean
clustering, circumcenter cluster features, greedy gated data association,
low-pass position filtering and Infinite-Horizon Gaussian-Process velocity
estimation — all fused into one pure jitted ``step`` over fixed shapes so a
frame never round-trips to host between cluster, associate and update.

Reference behavior citations use ``ref:`` + file:line into the upstream
repo (e.g. ``ref: src/multiple_object_tracking_lidar.cpp:444``).
"""

from multiple_object_tracking_lidar_tpu.config import (
    TrackerConfig,
    Capacities,
    SceneBounds,
    load_config,
)
from multiple_object_tracking_lidar_tpu.tracker.state import TrackerState, Frame
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker

__version__ = "0.1.0"

__all__ = [
    "TrackerConfig",
    "Capacities",
    "SceneBounds",
    "load_config",
    "TrackerState",
    "Frame",
    "Tracker",
    "__version__",
]
