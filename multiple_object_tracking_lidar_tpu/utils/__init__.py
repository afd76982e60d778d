from multiple_object_tracking_lidar_tpu.utils.colors import GlibcRand, make_colorset
from multiple_object_tracking_lidar_tpu.utils.pgm import load_pgm, load_map_yaml

__all__ = ["GlibcRand", "make_colorset", "load_pgm", "load_map_yaml"]
