from ccv_mppi_path_tracker_tpu.paths.resample import PathBuffer, resample_reference
from ccv_mppi_path_tracker_tpu.paths.courses import (
    sum_of_cosines_course,
    circle_course,
    waypoint_course,
    dkan_course,
    filtered_square_course,
)
from ccv_mppi_path_tracker_tpu.paths.spline import CubicSpline, spline_resample_course

__all__ = [
    "PathBuffer",
    "resample_reference",
    "sum_of_cosines_course",
    "circle_course",
    "waypoint_course",
    "dkan_course",
    "filtered_square_course",
    "CubicSpline",
    "spline_resample_course",
]
