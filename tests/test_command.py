"""Command-geometry unit tests against hand-computed turning-radius values."""

import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.solver.command import (
    command_from_solution,
    wheel_steer_angles,
)

TREAD = 0.501


def test_wheel_steer_angles_hand_computed():
    v, w, d = 1.0, 0.5, np.radians(10.0)
    r = abs(v / w)  # 2.0
    sl, sr = wheel_steer_angles(jnp.asarray(v), jnp.asarray(w), jnp.asarray(d), TREAD)
    steer_in = np.arctan2(r * np.sin(d), r * np.cos(d) - TREAD / 2)
    steer_out = np.arctan2(r * np.sin(d), r * np.cos(d) + TREAD / 2)
    # w > 0: left wheel is the inner wheel (src/steering_diff_drive_mppi.cpp:284)
    np.testing.assert_allclose(float(sl), steer_in, rtol=1e-6)
    np.testing.assert_allclose(float(sr), steer_out, rtol=1e-6)
    # inner wheel steers more sharply
    assert abs(float(sl)) > abs(float(sr))


def test_wheel_steer_sides_swap_with_turn_direction():
    v, d = 1.0, np.radians(10.0)
    sl_p, sr_p = wheel_steer_angles(jnp.asarray(v), jnp.asarray(0.5), jnp.asarray(d), TREAD)
    sl_n, sr_n = wheel_steer_angles(jnp.asarray(v), jnp.asarray(-0.5), jnp.asarray(d), TREAD)
    np.testing.assert_allclose(float(sl_p), float(sr_n), rtol=1e-6)
    np.testing.assert_allclose(float(sr_p), float(sl_n), rtol=1e-6)


def test_zero_steer_goes_straight():
    sl, sr = wheel_steer_angles(jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(0.0), TREAD)
    assert float(sl) == 0.0 and float(sr) == 0.0


def test_command_unicycle_zero_steer_with_pitch_offset():
    cmd = command_from_solution(
        "unicycle", jnp.array([0.8, 0.2]), 0.1, pitch_offset=np.radians(3.0)
    )
    assert float(cmd.steer_l) == float(cmd.steer_r) == 0.0
    np.testing.assert_allclose(float(cmd.fore), np.radians(3.0), rtol=1e-6)
    assert float(cmd.roll) == 0.0


def test_command_full_body_roll_integration_and_clamp():
    u0 = jnp.array([1.0, 0.3, 0.1, 0.4, 0.0])  # roll_v = 0.4 rad/s
    cmd = command_from_solution(
        "full_body", u0, dt=0.1, current_roll=0.2, roll_max=0.25
    )
    # roll = clamp(0.2 + 0.04, max 0.25) = 0.24
    np.testing.assert_allclose(float(cmd.roll), 0.24, rtol=1e-6)
    cmd2 = command_from_solution(
        "full_body", u0, dt=0.5, current_roll=0.2, roll_max=0.25
    )
    np.testing.assert_allclose(float(cmd2.roll), 0.25, rtol=1e-6)  # clamped
    cmd3 = command_from_solution(
        "full_body", u0, dt=0.1, current_roll=0.2, roll_off=True
    )
    assert float(cmd3.roll) == 0.0


def test_command_steer_off_zeroes_wheels():
    u0 = jnp.array([1.0, 0.3, 0.2, 0.0, 0.0])
    cmd = command_from_solution("full_body", u0, 0.1, steer_off=True)
    assert float(cmd.steer_l) == float(cmd.steer_r) == 0.0


def test_wheel_speeds_no_steer_differential_split():
    from ccv_mppi_path_tracker_tpu.solver.command import wheel_speeds

    wl, wr = wheel_speeds(
        jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(0.0)
    )
    r, L = 0.1435, 0.501
    np.testing.assert_allclose(float(wl), (1.0 - 0.5 * L / 2) / r, rtol=1e-6)
    np.testing.assert_allclose(float(wr), (1.0 + 0.5 * L / 2) / r, rtol=1e-6)


def test_wheel_speeds_steered_split_uses_radii():
    from ccv_mppi_path_tracker_tpu.solver.command import wheel_speeds

    v, w, d = 1.0, 0.5, np.radians(10.0)
    sl, sr = wheel_steer_angles(jnp.asarray(v), jnp.asarray(w), jnp.asarray(d), TREAD)
    wl, wr = wheel_speeds(jnp.asarray(v), jnp.asarray(w), sl, sr)
    rl = np.sin(abs(float(sr))) * TREAD / np.sin(abs(float(sl) - float(sr)))
    rr = np.sin(abs(float(sl))) * TREAD / np.sin(abs(float(sr) - float(sl)))
    split = abs(rr - rl)
    np.testing.assert_allclose(
        float(wr) - float(wl), w * split / 0.1435, rtol=1e-4
    )
    # mean wheel speed carries the forward velocity
    np.testing.assert_allclose(
        (float(wr) + float(wl)) / 2, v / 0.1435, rtol=1e-6
    )


def test_steering_mode_classifier_matches_reference_branches():
    """Same classification as check_State (src/steering_diff_drive_mppi.cpp:84-95)."""
    import jax
    from ccv_mppi_path_tracker_tpu.solver.command import (
        MODE_NO_NEED,
        MODE_NO_STEER,
        MODE_PARALLEL,
        MODE_STEER,
        STEERING_MODE_NAMES,
        steering_mode,
    )

    eps = 0.1 * np.pi / 180.0
    mode = jax.jit(steering_mode)
    # opposite signs ("ha"-shape): invalid regardless of magnitude
    assert int(mode(-0.2, 0.3)) == MODE_NO_NEED
    assert int(mode(0.2, -0.3)) == MODE_NO_NEED
    # both within eps of zero: plain diff-drive
    assert int(mode(eps * 0.5, eps * 0.5)) == MODE_NO_STEER
    assert int(mode(0.0, 0.0)) == MODE_NO_STEER
    # equal non-zero angles: parallel (crab) motion
    assert int(mode(0.3, 0.3 + eps * 0.5)) == MODE_PARALLEL
    # distinct same-sign angles: steering
    assert int(mode(0.2, 0.35)) == MODE_STEER
    # C++ branch order: sign check wins over near-equality at tiny
    # opposite-sign angles (sr<0 && sl>0 is tested first)
    assert int(mode(-1e-9, 1e-9)) == MODE_NO_NEED
    assert STEERING_MODE_NAMES[int(mode(0.2, 0.35))] == "steer"
