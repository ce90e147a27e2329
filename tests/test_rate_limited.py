"""Rate-limited steering model: dynamics, feasibility, closed-loop tracking."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.config import rate_limited_steering_config
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.models.rate_limited_steering import (
    RATE_MAX,
    STEER_MAX,
)
from ccv_mppi_path_tracker_tpu.runtime import run_tracking_experiment
from ccv_mppi_path_tracker_tpu.paths import sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.solver.command import command_from_solution


def test_steer_rate_and_angle_limits_enforced():
    m = get_model("rate_limited_steering")
    state = jnp.array([0.0, 0.0, 0.0, 0.0])
    # command an absurd steering rate: the slew clamp applies
    out = np.asarray(m.step(state, jnp.array([0.0, 0.0, 100.0]), 0.1))
    np.testing.assert_allclose(out[3], RATE_MAX * 0.1, rtol=1e-6)
    # saturate at the angle limit
    s = state
    for _ in range(30):
        s = m.step(s, jnp.array([0.0, 0.0, 100.0]), 0.1)
    np.testing.assert_allclose(float(s[3]), STEER_MAX, rtol=1e-6)


def test_position_uses_current_steer_angle():
    m = get_model("rate_limited_steering")
    state = jnp.array([0.0, 0.0, 0.0, 0.3])
    out = np.asarray(m.step(state, jnp.array([1.0, 0.0, 0.0]), 1.0))
    np.testing.assert_allclose(out[0], np.cos(0.3), rtol=1e-6)
    np.testing.assert_allclose(out[1], np.sin(0.3), rtol=1e-6)


def test_closed_loop_tracks_course():
    cfg, sp, cp, = rate_limited_steering_config(
        num_samples=512, horizon=15, path_weight=10.0, v_ref=1.2, v_max=2.0
    )
    course = sum_of_cosines_course(
        amplitudes=(1.0, 0, 0), frequencies=(0.25, 0, 0), deltas=(0, 0, 0),
        resolution=0.1, course_length=10.0, dtype=np.float32,
    )
    out = run_tracking_experiment(cfg, sp, cp, course, num_steps=100)
    assert out["metrics"]["rmse"] < 0.2, out["metrics"]
    assert out["logs"]["state"][-1, 0] > 4.0
    # steering state stayed inside the servo envelope during the whole run
    assert np.max(np.abs(out["logs"]["state"][:, 3])) <= STEER_MAX + 1e-6


def test_command_integrates_measured_steer():
    u0 = jnp.array([1.0, 0.5, 1.0])  # steer rate 1 rad/s
    cmd = command_from_solution(
        "rate_limited_steering", u0, dt=0.1, current_steer=0.2
    )
    # wheel angles computed from direction = 0.2 + 0.1
    from ccv_mppi_path_tracker_tpu.solver.command import wheel_steer_angles

    sl, sr = wheel_steer_angles(u0[0], u0[1], jnp.asarray(0.3), 0.501)
    np.testing.assert_allclose(float(cmd.steer_l), float(sl), rtol=1e-6)
    np.testing.assert_allclose(float(cmd.steer_r), float(sr), rtol=1e-6)
