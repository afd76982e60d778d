from multiple_object_tracking_lidar_tpu.models.matern32 import Matern32SSM, matern32_ssm
from multiple_object_tracking_lidar_tpu.models.ihgp import (
    IHGPGains,
    dare_fixed_point,
    stationary_gains,
    ihgp_filter_smoother,
    ihgp_batch,
)
from multiple_object_tracking_lidar_tpu.models.lpf import lpf_pos

__all__ = [
    "Matern32SSM",
    "matern32_ssm",
    "IHGPGains",
    "dare_fixed_point",
    "stationary_gains",
    "ihgp_filter_smoother",
    "ihgp_batch",
    "lpf_pos",
]
