"""Command geometry: optimal solution -> actuator commands.

The reference maps the head of the optimal sequence to a ``Twist`` (v, w) and
a ``CmdPoseByRadian`` (left/right wheel steering angles, fore/rear pitch,
upper-body roll):

- diff-drive node: zero steering, constant pitch offset
  (src/diff_drive_mppi.cpp:255-263).
- steering node: turning-radius geometry R = |v/w|,
  steer_in  = atan2(R sin d, R cos d - tread/2),
  steer_out = atan2(R sin d, R cos d + tread/2),
  inner/outer assigned by the sign of w
  (src/steering_diff_drive_mppi.cpp:273-296). IEEE quirks preserved
  bit-for-bit from the C++: w=0 gives R=inf and atan2(inf, inf) = pi/4 for
  both wheels (NOT the commanded direction); v=w=0 gives R=NaN and NaN
  steering angles. Downstream consumers that need safe angles should gate on
  |w| (the reference publishes the NaN).
- full-body node: same steering geometry (on the ``direction`` control) plus
  the integrated, clamped upper-body roll command
  (src/full_body_mppi.cpp:246-275).
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
class WheelSteerCommand:
    """The full actuator command set (Twist + CmdPoseByRadian equivalents)."""

    v: jax.Array
    w: jax.Array
    steer_l: jax.Array
    steer_r: jax.Array
    roll: jax.Array
    fore: jax.Array
    rear: jax.Array


# Steering-mode codes (steering_mode below). The reference returns strings
# from check_State (src/steering_diff_drive_mppi.cpp:84-95); integer codes
# keep the classifier jit-traceable.
MODE_NO_NEED = 0  # opposite-sign angles ("ha"-shape) — invalid, ROS_ERROR'd
MODE_NO_STEER = 1  # both ~zero: plain differential drive
MODE_PARALLEL = 2  # equal nonzero angles: crab motion
MODE_STEER = 3  # distinct same-sign angles: turning
STEERING_MODE_NAMES = ("no_need", "no_steer", "parallel", "steer")


def steering_mode(steer_r, steer_l, eps=0.1 * jnp.pi / 180.0):
    """Classify measured wheel steering angles into the reference's modes.

    Mirrors check_State (src/steering_diff_drive_mppi.cpp:84-95), which runs
    on every joint-state message and flags opposite-sign angles as invalid
    (:75-76). Same eps (0.1 deg) and branch order; returns an int code
    (MODE_* above, names in STEERING_MODE_NAMES) so it can run inside jit.
    """
    sr = jnp.asarray(steer_r)
    sl = jnp.asarray(steer_l)
    no_need = ((sr < 0.0) & (sl > 0.0)) | ((sr > 0.0) & (sl < 0.0))
    near_equal = jnp.abs(sr - sl) < eps
    both_zero = (jnp.abs(sr) < eps) & (jnp.abs(sl) < eps)
    return jnp.where(
        no_need,
        MODE_NO_NEED,
        jnp.where(
            near_equal,
            jnp.where(both_zero, MODE_NO_STEER, MODE_PARALLEL),
            MODE_STEER,
        ),
    )


def wheel_steer_angles(v, w, direction, tread):
    """(v, w, direction) -> (steer_l, steer_r) via turning-radius geometry."""
    r = jnp.abs(v / w)
    sin_d, cos_d = jnp.sin(direction), jnp.cos(direction)
    steer_in = jnp.arctan2(r * sin_d, r * cos_d - tread / 2.0)
    steer_out = jnp.arctan2(r * sin_d, r * cos_d + tread / 2.0)
    left_is_inner = w > 0.0
    steer_l = jnp.where(left_is_inner, steer_in, steer_out)
    steer_r = jnp.where(left_is_inner, steer_out, steer_in)
    return steer_l, steer_r


def wheel_speeds(v, w, steer_l, steer_r, tread=0.501, wheel_radius=0.1435):
    """Left/right wheel angular velocities (rad/s) for the commanded motion.

    Completes the actuation chain the reference delegates to its downstream
    diff-drive controller. Without steering, the classic differential split
    vl,r = v -+ w*tread/2. With distinct same-sign steering angles the wheels
    ride different turning radii Rl = sin|dr| L / sin|dl - dr| (the relation
    used in the feasibility analysis, src/v_w_performance.py:43-45), so the
    speed split becomes (vr - vl) = w * |Rr - Rl|.
    """
    sl, sr = steer_l, steer_r
    parallel = jnp.abs(sl - sr) < 1e-6
    rl = jnp.sin(jnp.abs(sr)) * tread / jnp.sin(jnp.abs(sl - sr) + 1e-12)
    rr = jnp.sin(jnp.abs(sl)) * tread / jnp.sin(jnp.abs(sr - sl) + 1e-12)
    split = jnp.where(parallel, tread, jnp.abs(rr - rl))
    vl = v - w * split / 2.0
    vr = v + w * split / 2.0
    return vl / wheel_radius, vr / wheel_radius


def command_from_solution(
    model_name: str,
    u0,
    dt,
    tread: float = 0.501,
    pitch_offset: float = 0.0,
    current_roll=0.0,
    current_steer=0.0,
    roll_min: float = -0.5235987755982988,
    roll_max: float = 0.5235987755982988,
    roll_off: bool = False,
    steer_off: bool = False,
) -> WheelSteerCommand:
    """Build the actuator command from the head of the optimal sequence."""
    zero = jnp.zeros_like(u0[0])
    v, w = u0[0], u0[1]
    po = jnp.asarray(pitch_offset, u0.dtype)

    if model_name == "unicycle":
        steer_l = steer_r = zero
        roll = zero
    else:
        if model_name == "rate_limited_steering":
            # u0[2] is a steering *rate*; the commanded angle is the measured
            # servo angle advanced one step — mirroring the full-body node's
            # roll integration (src/full_body_mppi.cpp:266).
            direction = current_steer + u0[2] * dt
        else:
            direction = u0[2]
        if steer_off:
            steer_l = steer_r = zero
        else:
            steer_l, steer_r = wheel_steer_angles(v, w, direction, tread)
        if model_name == "full_body":
            roll = jnp.clip(current_roll + u0[3] * dt, roll_min, roll_max)
            if roll_off:
                roll = zero
        else:
            roll = zero

    return WheelSteerCommand(
        v=v, w=w, steer_l=steer_l, steer_r=steer_r, roll=roll, fore=po, rear=po
    )
