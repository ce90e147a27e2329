"""Pure-pursuit baseline controller.

The reference evaluates its MPPI trackers against a pure-pursuit controller
from a sibling package (launch/pure_pursuit.launch; comparison plots in
src/graph2.py and per-method log directories in src/record_state.py:84-91).
This jittable equivalent provides the same baseline inside the framework:
classic lookahead pure pursuit on the PathBuffer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.paths.resample import PathBuffer, nearest_index


@dataclasses.dataclass(frozen=True)
class PurePursuitConfig:
    lookahead: float = 1.0  # m
    v_ref: float = 1.2
    w_max: float = 2.0


def pure_pursuit_step(cfg: PurePursuitConfig, state, path: PathBuffer):
    """One control step: returns u0 = (v, w).

    Picks the first path point at least ``lookahead`` ahead of the nearest
    index, transforms it into the robot frame, and commands the arc through
    it: w = 2 v y_local / L^2.
    """
    x, y, yaw = state[0], state[1], state[2]
    cur = nearest_index(path, state[:2])
    xy = jnp.asarray(path.xy)
    diff = xy - jnp.stack([x, y])
    dist = jnp.hypot(diff[:, 0], diff[:, 1])
    idx_arr = jnp.arange(xy.shape[0])
    valid = (idx_arr >= cur) & (idx_arr < path.num_valid) & (
        dist >= cfg.lookahead
    )
    # first qualifying index; fall back to the last valid point near course end
    target_idx = jnp.where(
        jnp.any(valid), jnp.argmax(valid), path.num_valid - 1
    )
    target = xy[target_idx]
    dx, dy = target[0] - x, target[1] - y
    y_local = -jnp.sin(yaw) * dx + jnp.cos(yaw) * dy
    l2 = dx * dx + dy * dy
    curvature = 2.0 * y_local / jnp.maximum(l2, 1e-9)
    v = jnp.asarray(cfg.v_ref, xy.dtype)
    w = jnp.clip(v * curvature, -cfg.w_max, cfg.w_max)
    return jnp.stack([v, w])


def run_pure_pursuit_experiment(
    course, num_steps=200, dt=0.1, cfg: PurePursuitConfig = PurePursuitConfig(),
    dtype=None,
):
    """Closed-loop pure-pursuit tracking (fused scan), for MPPI comparison."""
    import numpy as np

    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.models.registry import get_model

    dtype = dtype or jnp.float32
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    plant = get_model("unicycle")
    state0 = jnp.asarray(
        [course[0, 0], course[0, 1],
         float(np.arctan2(course[1, 1] - course[0, 1], course[1, 0] - course[0, 0]))],
        dtype,
    )

    def body(state, _):
        u0 = pure_pursuit_step(cfg, state, path)
        state = plant.step(state, u0, dt)
        return state, {"state": state, "u0": u0}

    _, logs = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=num_steps)
    )(state0)
    logs = jax.tree.map(np.asarray, logs)
    xy = np.concatenate([np.asarray(state0[None, :2]), logs["state"][:, :2]])
    return {
        "logs": logs,
        "metrics": tracking_metrics(xy, course, dt=dt),
        "course": course,
    }
