from ccv_mppi_path_tracker_tpu.metrics.tracking import (
    curvature,
    nearest_point_errors,
    tracking_metrics,
)
from ccv_mppi_path_tracker_tpu.metrics.recorder import Recorder, read_log
from ccv_mppi_path_tracker_tpu.metrics.animate import animate_tracking

__all__ = [
    "curvature",
    "nearest_point_errors",
    "tracking_metrics",
    "Recorder",
    "read_log",
    "animate_tracking",
]
