from ccv_mppi_path_tracker_tpu.models.base import Model
from ccv_mppi_path_tracker_tpu.models.registry import get_model, register_model
from ccv_mppi_path_tracker_tpu.models import (
    unicycle,
    steering_unicycle,
    rate_limited_steering,
    full_body,
)
from ccv_mppi_path_tracker_tpu.models.full_body import FullBodyParams

__all__ = [
    "Model",
    "get_model",
    "register_model",
    "unicycle",
    "steering_unicycle",
    "rate_limited_steering",
    "full_body",
    "FullBodyParams",
]
