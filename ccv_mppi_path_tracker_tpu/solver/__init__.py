from ccv_mppi_path_tracker_tpu.solver.mppi import MPPISolver, mppi_step
from ccv_mppi_path_tracker_tpu.solver.command import (
    WheelSteerCommand,
    command_from_solution,
    wheel_steer_angles,
    wheel_speeds,
    steering_mode,
    STEERING_MODE_NAMES,
)

__all__ = [
    "MPPISolver",
    "mppi_step",
    "WheelSteerCommand",
    "command_from_solution",
    "wheel_steer_angles",
    "wheel_speeds",
    "steering_mode",
    "STEERING_MODE_NAMES",
]
