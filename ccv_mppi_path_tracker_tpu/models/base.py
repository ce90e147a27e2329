"""Dynamics model interface.

A model is a *pure, batched* Euler step ``(state, u, dt) -> state`` over rows
of shape (..., S) and (..., U) — the functional, vectorized re-statement of
the reference's in-place per-sample ``predict_NextState`` mutation
(src/diff_drive_mppi.cpp:104-109). Batching is by broadcasting, not vmap, so
the same function serves K-sample rollouts, the single optimal-path re-roll,
and the sim plant.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class Model:
    """A dynamics family.

    step: (state (..., S), u (..., U), dt) -> next state (..., S).
    control_names / state_names: documentation + CSV headers.
    aux_from_rollout: optional post-rollout vectorized pass computing derived
        per-step quantities from the whole trajectory (full-body ZMP chain,
        src/full_body_mppi.cpp:468-486). Signature
        (states (T, ..., S), controls (T-1, ..., U), dt, params) -> aux pytree.
    cost_fn: optional per-trajectory cost override, signature
        (states (T, K, S), controls (T-1, K, U), aux, ref: RefWindow,
        cp: CostParams) -> (K,). When set, the solver's XLA pipeline (and
        gradient refinement, which differentiates the same function) uses
        it instead of the builtin tracking/full-body cost — the extension
        point for user-registered models with custom objectives
        (examples/custom_model.py). Must be jit-traceable; Gauss-Newton
        refinement keeps the builtin least-squares residual structure.
    """

    name: str
    state_names: tuple
    control_names: tuple
    step: Callable
    aux_from_rollout: Optional[Callable] = None
    default_params: object = None
    cost_fn: Optional[Callable] = None
    # static numeric constants baked into step (e.g. rate_limited_steering's
    # steer/rate limits). Consumers that re-derive the dynamics outside
    # ``step`` (ops/rollout.py closed form, the fused kernel) read the limits
    # from HERE, so a re-registered custom-limit variant can never silently
    # diverge from its own step function (ADVICE r3).
    constants: Optional[dict] = None

    @property
    def num_states(self) -> int:
        return len(self.state_names)

    @property
    def num_controls(self) -> int:
        return len(self.control_names)
