from ccv_mppi_path_tracker_tpu.runtime.plant import Plant
from ccv_mppi_path_tracker_tpu.runtime.loop import (
    ControlLoop,
    build_simulate_scan,
    run_tracking_experiment,
)
from ccv_mppi_path_tracker_tpu.runtime.checkpoint import (
    save_checkpoint,
    load_checkpoint,
)

__all__ = [
    "Plant",
    "ControlLoop",
    "build_simulate_scan",
    "run_tracking_experiment",
    "save_checkpoint",
    "load_checkpoint",
]
