from multiple_object_tracking_lidar_tpu.parallel.sharding import (
    make_mesh,
    ShardedTracker,
)

__all__ = ["make_mesh", "ShardedTracker"]
