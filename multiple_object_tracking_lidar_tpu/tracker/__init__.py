from multiple_object_tracking_lidar_tpu.tracker.state import TrackerState, TrackBank, Frame, FrameOutput
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker

__all__ = ["TrackerState", "TrackBank", "Frame", "FrameOutput", "Tracker"]
