"""Core pytree types flowing through the solver.

The reference keeps per-sample state in ``RobotStates`` — parallel
``std::vector<double>`` members mutated in place
(include/ccv_mppi_path_tracker/full_body_mppi.h:34-65). Here everything is an
immutable batched array: states are ``(..., S)`` rows, control sequences are
time-major ``(T-1, ..., U)`` so ``lax.scan`` consumes the leading axis
directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass
class RefWindow:
    """Horizon-length local reference resampled from the global path.

    Mirrors the reference's ``x_ref_/y_ref_/yaw_ref_`` vectors
    (src/diff_drive_mppi.cpp:156-181). ``xy`` is (T, 2); ``yaw`` is (T,).
    """

    xy: jax.Array
    yaw: jax.Array


@_pytree_dataclass
@dataclasses.dataclass
class ControllerState:
    """Everything the controller carries between control cycles.

    u_prev: (T-1, U) previous optimal control sequence — the sampling mean
        (warm start, src/diff_drive_mppi.cpp:89-90). Note the reference does
        NOT shift the sequence one step; neither do we by default.
    key: PRNG key for this cycle's sampling (replaces the reference's
        per-cycle ``std::random_device`` reseed, src/diff_drive_mppi.cpp:83-84,
        which is unseedable; ours is reproducible).
    step: int32 cycle counter.
    """

    u_prev: jax.Array
    key: jax.Array
    step: jax.Array

    @staticmethod
    def initial(key, horizon: int, num_controls: int, dtype=jnp.float32):
        return ControllerState(
            u_prev=jnp.zeros((horizon - 1, num_controls), dtype=dtype),
            key=key,
            step=jnp.zeros((), jnp.int32),
        )


@_pytree_dataclass
@dataclasses.dataclass
class StepResult:
    """Outputs of one MPPI control step.

    u_opt: (T-1, U) new optimal sequence (importance-weighted average,
        src/diff_drive_mppi.cpp:225-246).
    u0: (U,) the actuated command — head of the sequence
        (src/diff_drive_mppi.cpp:248-253).
    ref: the resampled local reference used this cycle (debug parity with the
        reference's /ccv_mppi_path_tracker/ref_path topic).
    opt_states: (T, S) rollout of the optimal sequence from the current state
        (reference publish_OptimalPath, src/diff_drive_mppi.cpp:295-312).
    stats: dict of scalar diagnostics (min/mean cost, ESS, weight entropy).

    In ``mppi_step(..., lean=True)`` serving mode ``ref``/``opt_states`` are
    None and ``stats`` is empty (diagnostics dropped to minimize per-step
    output-buffer allocation); ``u_opt``/``u0`` are unchanged.
    """

    u_opt: jax.Array
    u0: jax.Array
    ref: RefWindow
    opt_states: jax.Array
    stats: dict
