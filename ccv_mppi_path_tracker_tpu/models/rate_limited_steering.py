"""Rate-limited steering diff-drive: steering angle as a state.

The reference's steering controller treats the steering angle as a direct
control (src/steering_diff_drive_mppi.cpp:120-125) — physically the Dynamixel
steering servos slew at finite speed. This family (called for by
BASELINE.json's "steerable diff-drive model with steering-angle states and
rate limits" config) carries the steering angle in the state and controls its
*rate*:

    state    (x, y, yaw, steer)
    controls (v, w, steer_rate)

    steer'  = clip(steer + clip(steer_rate, +-rate_max) dt, +-steer_max)
    x'      = x + v cos(yaw + steer) dt
    y'      = y + v sin(yaw + steer) dt
    yaw'    = yaw + w dt

Position integrates with the *current* steering angle (the servo moves during
the step it is commanded), so candidate trajectories can never assume an
instantaneous steering jump — the feasibility gap that makes the direct-
control model optimistic at high speed.

Limits are compile-time constants of the model variant (make_model builds a
custom-limit variant); defaults are the reference's 30 deg steering box
(src/steering_diff_drive_mppi.cpp:25) and a conservative ~2.6 rad/s servo
slew.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.models.base import Model
from ccv_mppi_path_tracker_tpu.models.registry import register_model

STEER_MAX = 30.0 * math.pi / 180.0
RATE_MAX = 2.6


def make_step(steer_max: float = STEER_MAX, rate_max: float = RATE_MAX):
    def step(state, u, dt):
        x, y, yaw, steer = (
            state[..., 0], state[..., 1], state[..., 2], state[..., 3]
        )
        v, w, rate = u[..., 0], u[..., 1], u[..., 2]
        heading = yaw + steer
        rate = jnp.clip(rate, -rate_max, rate_max)
        new_steer = jnp.clip(steer + rate * dt, -steer_max, steer_max)
        return jnp.stack(
            [
                x + v * jnp.cos(heading) * dt,
                y + v * jnp.sin(heading) * dt,
                yaw + w * dt,
                new_steer,
            ],
            axis=-1,
        )

    return step


def make_model(name="rate_limited_steering", steer_max=STEER_MAX,
               rate_max=RATE_MAX) -> Model:
    return Model(
        name=name,
        state_names=("x", "y", "yaw", "steer"),
        control_names=("v", "w", "steer_rate"),
        step=make_step(steer_max, rate_max),
        # single source of truth for consumers that re-derive the dynamics
        # (closed-form rollout, fused kernel) — see Model.constants
        constants={"steer_max": steer_max, "rate_max": rate_max},
    )


MODEL = register_model(make_model())
