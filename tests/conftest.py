"""Test environment: CPU backend with 8 virtual devices.

Sharding tests exercise the multi-chip path on a fake 8-device CPU mesh
(``--xla_force_host_platform_device_count``), the CI pattern recommended in
SURVEY.md section 4 since real multi-chip hardware is not available in CI.
x64 is enabled so parity tests can match the float64 NumPy oracle bit-tightly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough here: the container's sitecustomize
# registers a TPU tunnel plugin at interpreter boot with JAX_PLATFORMS=axon
# already exported; the config update below reliably pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
