from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import (
    K_TILE,
    fused_sample_rollout_cost,
    pack_scalars,
)

__all__ = ["K_TILE", "fused_sample_rollout_cost", "pack_scalars"]
