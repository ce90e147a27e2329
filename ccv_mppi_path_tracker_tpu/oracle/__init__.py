from ccv_mppi_path_tracker_tpu.oracle.numpy_oracle import oracle_step

__all__ = ["oracle_step"]
