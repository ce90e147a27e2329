from ccv_mppi_path_tracker_tpu.parallel.mesh import samples_mesh, SAMPLES_AXIS
from ccv_mppi_path_tracker_tpu.parallel.sharded import (
    build_sharded_step,
    build_sharded_simulate,
)
from ccv_mppi_path_tracker_tpu.parallel.multihost import initialize_multihost

__all__ = [
    "samples_mesh",
    "SAMPLES_AXIS",
    "build_sharded_step",
    "build_sharded_simulate",
    "initialize_multihost",
]
