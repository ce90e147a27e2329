"""Steering ("crab") differential drive.

State (x, y, yaw); controls (v, w, steer). The motion direction is decoupled
from the body yaw by the steering angle (src/steering_diff_drive_mppi.cpp:120-125):

    x'   = x   + v cos(yaw + steer) dt
    y'   = y   + v sin(yaw + steer) dt
    yaw' = yaw + w dt
"""

from __future__ import annotations

import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.models.base import Model
from ccv_mppi_path_tracker_tpu.models.registry import register_model


def step(state, u, dt):
    x, y, yaw = state[..., 0], state[..., 1], state[..., 2]
    v, w, steer = u[..., 0], u[..., 1], u[..., 2]
    heading = yaw + steer
    return jnp.stack(
        [
            x + v * jnp.cos(heading) * dt,
            y + v * jnp.sin(heading) * dt,
            yaw + w * dt,
        ],
        axis=-1,
    )


MODEL = register_model(
    Model(
        name="steering_unicycle",
        state_names=("x", "y", "yaw"),
        control_names=("v", "w", "steer"),
        step=step,
    )
)
