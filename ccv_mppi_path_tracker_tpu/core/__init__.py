from ccv_mppi_path_tracker_tpu.core.config import (
    SolverConfig,
    SolverParams,
    CostParams,
    diff_drive_config,
    steering_diff_drive_config,
    full_body_config,
    make_cost_params,
    make_solver_params,
)
from ccv_mppi_path_tracker_tpu.core.types import RefWindow, StepResult, ControllerState

__all__ = [
    "SolverConfig",
    "SolverParams",
    "CostParams",
    "RefWindow",
    "StepResult",
    "ControllerState",
    "diff_drive_config",
    "steering_diff_drive_config",
    "full_body_config",
    "make_cost_params",
    "make_solver_params",
]
