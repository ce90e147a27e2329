"""AOT export of the control step for deployment.

``jax.export`` serializes the lowered (StableHLO) control step so a serving
process can load and run it without tracing Python — the framework's
equivalent of shipping the reference's compiled C++ node binaries. The
exported artifact pins static structure (model, K, T); numeric parameters
remain runtime inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.config import SolverConfig
from ccv_mppi_path_tracker_tpu.core.types import ControllerState
from ccv_mppi_path_tracker_tpu.models.registry import get_model
from ccv_mppi_path_tracker_tpu.paths.resample import PathBuffer
from ccv_mppi_path_tracker_tpu.solver.mppi import mppi_step


_REGISTERED = False


def _register_serializations():
    """Register the framework's pytree dataclasses with jax.export.

    All of them use register_dataclass with every field as a child, so the
    auxdata is structural only and serializes to nothing.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jax_export

    from ccv_mppi_path_tracker_tpu.core.config import CostParams, SolverParams
    from ccv_mppi_path_tracker_tpu.core.types import (
        ControllerState,
        RefWindow,
        StepResult,
    )
    from ccv_mppi_path_tracker_tpu.models.full_body import FullBodyParams

    for cls in (ControllerState, StepResult, RefWindow, PathBuffer,
                SolverParams, CostParams, FullBodyParams):
        try:
            jax_export.register_pytree_node_serialization(
                cls,
                serialized_name=f"ccv_mppi.{cls.__name__}",
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: (),
            )
        except ValueError:
            pass  # already registered
    _REGISTERED = True


def export_control_step(
    cfg: SolverConfig,
    path_capacity: int,
    sp,
    cp,
    model_params=None,
    dtype=jnp.float32,
) -> bytes:
    """Serialize the jitted control step for this config.

    Returns the serialized artifact bytes; persist with open(f,'wb').write().
    Example args are placeholders of the right shapes — the export pins
    shapes/dtypes, not values.
    """
    from jax import export as jax_export

    _register_serializations()
    model = get_model(cfg.model)
    ctrl = ControllerState.initial(
        jax.random.PRNGKey(0), cfg.horizon, model.num_controls, dtype=dtype
    )
    state = jnp.zeros(model.num_states, dtype)
    path = PathBuffer(
        xy=jnp.zeros((path_capacity, 2), dtype),
        num_valid=jnp.asarray(path_capacity, jnp.int32),
        resolution=jnp.asarray(0.1, dtype),
    )
    dt = jnp.asarray(0.1, dtype)

    fn = jax.jit(functools.partial(mppi_step, cfg, model_params=model_params))
    exported = jax_export.export(fn)(ctrl, state, path, dt, sp, cp)
    return bytes(exported.serialize())


def load_control_step(blob: bytes):
    """Deserialize an exported control step; returns a callable
    (ctrl, state, path, dt, sp, cp) -> (ctrl, StepResult)."""
    from jax import export as jax_export

    _register_serializations()
    exported = jax_export.deserialize(blob)
    return exported.call
