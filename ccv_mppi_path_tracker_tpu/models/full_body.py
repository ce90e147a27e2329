"""Full-body CCV model: steered base plus actuated upper body, with ZMP.

State (x, y, yaw, roll, pitch); controls (v, w, direction, roll_v, pitch_v).
Euler step matching src/full_body_mppi.cpp:445-452:

    x'     = x     + v cos(yaw + direction) dt
    y'     = y     + v sin(yaw + direction) dt
    yaw'   = yaw   + w dt
    roll'  = roll  + roll_v dt
    pitch' = pitch + pitch_v dt

The zero-moment-point is a *post-rollout vectorized pass* over the whole
trajectory (same structure as the reference: rollout first
src/full_body_mppi.cpp:465-467, then the ZMP chain :468-486) because step t's
ZMP reads controls at t+1 (finite-difference accelerations). For each
t in [0, T-3]:

    drive_accel = (v[t+1] - v[t]) / dt                      (:469)
    a_c  = v[t] w[t]                       centripetal      (:471)
    a_x  = da cos(dir) - a_c sin(dir)                       (:472)
    a_y  = da sin(dir) + a_c cos(dir)                       (:473)
    Hdot = I (omega[t+1] - omega[t]) / dt,  omega = (roll_v, pitch_v, w)
                                                            (:477-481)
    CoM  = c (sin(pitch), -sin(roll)... )                   (:482)
    M_O  = CoM x (m g) - CoM x (m a) - Hdot                 (:600)
    ZMP  = z x M_O / (m (g - a) . z)                        (:601)

Physical constants come from the reference ctor: the upper body is modelled
as a 60 kg box 0.208 x 0.208 x 0.8075 m; the inertia tensor about the base
pivot is diagonal (src/full_body_mppi.cpp:86-91) — note the ctor's
``base2CoM(0.5735)`` initializer is overridden to ``upper_body_height/2`` at
:86, so the effective lever arm is 0.40375 m.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.models.base import Model
from ccv_mppi_path_tracker_tpu.models.registry import register_model


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


# Geometry constants (src/full_body_mppi.cpp:6, :57-63) — used by the command
# mapping and force-sensor ZMP, not by the differentiable dynamics.
TREAD = 0.501
WHEEL_RADIUS = 0.1435
UPPER_BODY_HEIGHT = 0.8075
UPPER_BODY_DEPTH = 0.208
UPPER_BODY_WIDTH = 0.208
CONTACT_POSITIONS = np.array(
    [
        [0.0, 0.225, 0.075],  # left wheel
        [0.0, -0.225, 0.075],  # right wheel
        [0.245, 0.167, -0.003],  # front-left caster
        [0.245, -0.167, -0.004],  # front-right caster
        [-0.245, -0.167, -0.004],  # back-left caster
        [-0.245, 0.167, -0.003],  # back-right caster
    ]
)


@_pytree_dataclass
@dataclasses.dataclass
class FullBodyParams:
    """Differentiable physical parameters of the upper-body ZMP model."""

    mass: jax.Array
    base2com: jax.Array
    inertia: jax.Array  # (3,) diagonal of I_O
    gravity_z: jax.Array  # -9.8 (src/full_body_mppi.h:30)


def default_params(dtype=np.float32) -> FullBodyParams:
    m = 60.0
    h, d, w = UPPER_BODY_HEIGHT, UPPER_BODY_DEPTH, UPPER_BODY_WIDTH
    c = h / 2.0  # src/full_body_mppi.cpp:86
    inertia = np.array(
        [
            m * (w * w + h * h) / 12.0 + m * c * c,
            m * (h * h + d * d) / 12.0 + m * c * c,
            m * (d * d + w * w) / 12.0,
        ],
        dtype=dtype,
    )  # src/full_body_mppi.cpp:87-91
    return FullBodyParams(
        mass=np.asarray(m, dtype),
        base2com=np.asarray(c, dtype),
        inertia=inertia,
        gravity_z=np.asarray(-9.8, dtype),
    )


def step(state, u, dt):
    x, y, yaw = state[..., 0], state[..., 1], state[..., 2]
    roll, pitch = state[..., 3], state[..., 4]
    v, w, direction = u[..., 0], u[..., 1], u[..., 2]
    roll_v, pitch_v = u[..., 3], u[..., 4]
    heading = yaw + direction
    return jnp.stack(
        [
            x + v * jnp.cos(heading) * dt,
            y + v * jnp.sin(heading) * dt,
            yaw + w * dt,
            roll + roll_v * dt,
            pitch + pitch_v * dt,
        ],
        axis=-1,
    )


def zmp_from_model(com, accel, hg_dot, params: FullBodyParams):
    """ZMP of the box model given CoM position, base acceleration and dHG/dt.

    Vectorized restatement of computeZMPfromModel (src/full_body_mppi.cpp:597-603).
    ``com``/``accel``/``hg_dot`` are (..., 3); returns (..., 2) = (zmp_x, zmp_y).
    Gravity is (0, 0, gravity_z); accel z-component is assumed present in the
    input (the rollout passes 0, the IMU estimator passes measured values with
    z zeroed, matching :555).
    """
    m = params.mass
    # b = m * (g - a)
    bx = -m * accel[..., 0]
    by = -m * accel[..., 1]
    bz = m * (params.gravity_z - accel[..., 2])
    # M_O = CoM x b - HGdot
    mo_x = com[..., 1] * bz - com[..., 2] * by - hg_dot[..., 0]
    mo_y = com[..., 2] * bx - com[..., 0] * bz - hg_dot[..., 1]
    # ZMP = z x M_O / (b . z);   z x M_O = (-M_Oy, M_Ox, 0)
    denom = bz
    return jnp.stack([-mo_y / denom, mo_x / denom], axis=-1)


def com_position(roll, pitch, params: FullBodyParams):
    """Upper-body CoM in the base frame (src/full_body_mppi.cpp:482)."""
    c = params.base2com
    return jnp.stack(
        [
            c * jnp.sin(pitch),
            -c * jnp.sin(roll),
            c * jnp.cos(pitch) * jnp.cos(roll),
        ],
        axis=-1,
    )


def zmp_chain(states, controls, dt, params: FullBodyParams):
    """Per-step ZMP over a rollout (src/full_body_mppi.cpp:468-486).

    states: (T, ..., 5) time-major; controls: (T-1, ..., 5).
    Returns zmp (T-2, ..., 2) — entry t uses state[t], controls[t] and
    controls[t+1], exactly the reference's ``t < horizon_-2`` loop.
    """
    v, w = controls[..., 0], controls[..., 1]
    direction = controls[..., 2]
    drive_accel = (v[1:] - v[:-1]) / dt  # (T-2, ...)
    ac = v[:-1] * w[:-1]
    cos_d, sin_d = jnp.cos(direction[:-1]), jnp.sin(direction[:-1])
    ax = drive_accel * cos_d - ac * sin_d
    ay = drive_accel * sin_d + ac * cos_d
    accel = jnp.stack([ax, ay, jnp.zeros_like(ax)], axis=-1)

    omega = jnp.stack(
        [controls[..., 3], controls[..., 4], controls[..., 1]], axis=-1
    )  # (T-1, ..., 3)
    hg_dot = (omega[1:] - omega[:-1]) * (params.inertia / dt)

    roll = states[:-2, ..., 3]
    pitch = states[:-2, ..., 4]
    com = com_position(roll, pitch, params)
    return zmp_from_model(com, accel, hg_dot, params)


def aux_from_rollout(states, controls, dt, params):
    return {"zmp": zmp_chain(states, controls, dt, params)}


MODEL = register_model(
    Model(
        name="full_body",
        state_names=("x", "y", "yaw", "roll", "pitch"),
        control_names=("v", "w", "direction", "roll_v", "pitch_v"),
        step=step,
        aux_from_rollout=aux_from_rollout,
        default_params=default_params(),
    )
)
