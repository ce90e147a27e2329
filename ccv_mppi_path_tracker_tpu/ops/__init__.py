from ccv_mppi_path_tracker_tpu.ops.sampling import sample_controls
from ccv_mppi_path_tracker_tpu.ops.rollout import rollout
from ccv_mppi_path_tracker_tpu.ops.mindist import min_sq_distance
from ccv_mppi_path_tracker_tpu.ops.costs import trajectory_costs
from ccv_mppi_path_tracker_tpu.ops.softmax_update import (
    softmax_weights,
    weighted_update,
)

__all__ = [
    "sample_controls",
    "rollout",
    "min_sq_distance",
    "trajectory_costs",
    "softmax_weights",
    "weighted_update",
]
