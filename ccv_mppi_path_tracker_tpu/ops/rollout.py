"""Batched trajectory rollout.

``lax.scan`` over the horizon with all K samples advanced per step — the
vectorized form of the reference's per-sample Euler loop
(src/diff_drive_mppi.cpp:111-124). The scan is sequential by physics (state
t+1 depends on state t); parallelism lives in the K batch axis, which XLA
lays out on TPU vector lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout(step_fn, state0: jax.Array, controls: jax.Array, dt,
            unroll: int | bool | None = None):
    """Integrate ``controls`` from ``state0``.

    step_fn: batched model step (state, u, dt) -> state.
    state0: (..., S) initial state (broadcast across K happens in the caller).
    controls: (T-1, ..., U) time-major control sequences.
    Returns states (T, ..., S) including the initial state at index 0.

    unroll: forwarded to ``lax.scan``. Defaults to FULL unroll for a single
    trajectory (state0 is (S,)) — the optimal-sequence re-roll is T tiny
    scalar fusions that cost more in per-kernel launch overhead than in
    flops, so XLA should see straight-line code — and no unroll for batched
    (K, S) rollouts, where each step is already a big fused kernel.
    """
    if unroll is None:
        unroll = state0.ndim == 1

    def f(s, u):
        s_next = step_fn(s, u, dt)
        return s_next, s_next

    _, traj = jax.lax.scan(f, state0, controls, unroll=unroll)
    return jnp.concatenate([state0[None], traj], axis=0)
