"""Per-trajectory cost functions.

Vectorized restatements of the reference ``calc_Cost`` methods:

- unicycle / steering models (src/diff_drive_mppi.cpp:194-210,
  src/steering_diff_drive_mppi.cpp:210-226): path-tracking + velocity terms.
  NOTE an intentional fix: the reference sums the velocity term for
  t in [0, T-1] but the control vectors only have T-1 entries, so the t=T-1
  read is out of bounds (undefined behavior; see
  include/ccv_mppi_path_tracker/diff_drive_mppi.h:38-39 vs
  src/diff_drive_mppi.cpp:199-204). We define the path term over all T states
  and the velocity term over the T-1 defined controls — identical to the C++
  on every *defined* term.

- full-body model (src/full_body_mppi.cpp:404-424): adds ZMP-y, roll-rate
  smoothness, backward-motion penalty, and an initial-yaw term; all its loop
  indices are in range (t < horizon-2) and are matched exactly. The yaw term
  uses the shared initial yaw so it is constant across samples (softmax-shift
  invariant); kept for cost-value parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.core.config import CostParams
from ccv_mppi_path_tracker_tpu.core.types import RefWindow
from ccv_mppi_path_tracker_tpu.ops.mindist import min_sq_distance


def tracking_cost(states, controls, ref: RefWindow, cp: CostParams):
    """Cost for the unicycle / steering models. Returns (K,).

    states: (T, K, S); controls: (T-1, K, U).
    """
    d2 = min_sq_distance(states[..., :2], ref.xy)  # (T, K)
    v = controls[..., 0]  # (T-1, K)
    dv = v - cp.v_ref
    return cp.path_weight * jnp.sum(d2, axis=0) + cp.v_weight * jnp.sum(
        dv * dv, axis=0
    )


def full_body_cost(states, controls, zmp, ref: RefWindow, cp: CostParams):
    """Cost for the full-body model (src/full_body_mppi.cpp:404-424).

    states: (T, K, 5); controls: (T-1, K, 5); zmp: (T-2, K, 2).
    Sums over t in [0, T-3] exactly as the reference's ``t < horizon_-2``.
    """
    tm2 = states.shape[0] - 2
    d2 = min_sq_distance(states[:tm2, ..., :2], ref.xy)  # (T-2, K)
    v = controls[:tm2, ..., 0]
    dv = v - cp.v_ref
    zmp_y = zmp[..., 1]  # (T-2, K)
    roll_v = controls[..., 3]  # (T-1, K)
    droll_v = roll_v[1 : tm2 + 1] - roll_v[:tm2]
    back = jnp.where(v < 0.0, v * v, 0.0)
    dyaw0 = states[0, ..., 2] - ref.yaw[0]

    cost = (
        cp.path_weight * jnp.sum(d2, axis=0)
        + cp.v_weight * jnp.sum(dv * dv, axis=0)
        + cp.zmp_weight * jnp.sum(zmp_y * zmp_y, axis=0)
        + cp.roll_v_weight * jnp.sum(droll_v * droll_v, axis=0)
        + cp.back_weight * jnp.sum(back, axis=0)
        + cp.yaw_weight * dyaw0 * dyaw0
    )
    return cost


def trajectory_costs(model_name, states, controls, aux, ref, cp):
    """Per-trajectory costs for ``model_name``: a registered custom
    ``Model.cost_fn`` when the model provides one (user extension point),
    else the builtin reference-semantics costs above."""
    from ccv_mppi_path_tracker_tpu.models.registry import get_model

    custom = get_model(model_name).cost_fn
    if custom is not None:
        return custom(states, controls, aux, ref, cp)
    if model_name == "full_body":
        return full_body_cost(states, controls, aux["zmp"], ref, cp)
    return tracking_cost(states, controls, ref, cp)
