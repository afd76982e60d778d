from multiple_object_tracking_lidar_tpu.runtime.node import TrackerNode
from multiple_object_tracking_lidar_tpu.runtime.checkpoint import save_state, load_state

__all__ = ["TrackerNode", "save_state", "load_state"]
