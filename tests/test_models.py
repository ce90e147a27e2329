"""Dynamics-model unit tests against hand-computed values."""

import numpy as np
import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.models import full_body, get_model
from ccv_mppi_path_tracker_tpu.models.full_body import default_params


def test_unicycle_step_hand_computed():
    m = get_model("unicycle")
    state = jnp.array([1.0, 2.0, np.pi / 2.0])
    u = jnp.array([2.0, 0.5])
    out = np.asarray(m.step(state, u, 0.1))
    np.testing.assert_allclose(
        out, [1.0 + 0.2 * np.cos(np.pi / 2), 2.0 + 0.2 * np.sin(np.pi / 2), np.pi / 2 + 0.05],
        rtol=1e-12,
    )


def test_unicycle_step_batched():
    m = get_model("unicycle")
    states = jnp.zeros((7, 3))
    u = jnp.ones((7, 2))
    out = m.step(states, u, 0.1)
    assert out.shape == (7, 3)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.1, rtol=1e-12)


def test_steering_heading_decoupled():
    m = get_model("steering_unicycle")
    state = jnp.array([0.0, 0.0, 0.0])
    u = jnp.array([1.0, 0.0, np.pi / 6.0])
    out = np.asarray(m.step(state, u, 1.0))
    np.testing.assert_allclose(out[0], np.cos(np.pi / 6), rtol=1e-12)
    np.testing.assert_allclose(out[1], np.sin(np.pi / 6), rtol=1e-12)
    # yaw unchanged: steering moves the velocity direction, not the body.
    np.testing.assert_allclose(out[2], 0.0, atol=1e-15)


def test_full_body_step_integrates_attitude():
    m = get_model("full_body")
    state = jnp.zeros(5)
    u = jnp.array([0.0, 0.0, 0.0, 0.2, -0.1])
    out = np.asarray(m.step(state, u, 0.5))
    np.testing.assert_allclose(out[3], 0.1, rtol=1e-12)
    np.testing.assert_allclose(out[4], -0.05, rtol=1e-12)


def test_zmp_static_upright_is_zero():
    """Static, level robot with constant controls: ZMP sits under the CoM."""
    p = default_params(np.float64)
    T = 6
    states = jnp.zeros((T, 1, 5))
    controls = jnp.zeros((T - 1, 1, 5))
    zmp = np.asarray(full_body.zmp_chain(states, controls, 0.1, p))
    assert zmp.shape == (T - 2, 1, 2)
    np.testing.assert_allclose(zmp, 0.0, atol=1e-12)


def test_zmp_lateral_acceleration_sign():
    """Constant forward speed with positive yaw rate -> centripetal accel +y
    -> ZMP displaced to -y (robot leans out of the turn)."""
    p = default_params(np.float64)
    T = 4
    states = jnp.zeros((T, 1, 5))
    controls = jnp.zeros((T - 1, 1, 5))
    controls = controls.at[:, :, 0].set(1.0)  # v
    controls = controls.at[:, :, 1].set(1.0)  # w
    zmp = np.asarray(full_body.zmp_chain(states, controls, 0.1, p))
    # a_y = v*w = +1; CoM at height c: zmp_y = c*a_y / g_z... sign: -y.
    assert np.all(zmp[:, :, 1] < 0)
    # hand value: accel=(0,1,0), com=(0,0,c); M_O_x = com_y*b_z - com_z*b_y
    # with b = m*(g - a): b_y = -m, b_z = -9.8m -> M_O_x = c*m
    # zmp_y = M_O_x / b_z = c*m / (-9.8 m) = -c/9.8
    c = float(p.base2com)
    np.testing.assert_allclose(zmp[:, :, 1], -c / 9.8, rtol=1e-6)


def test_zmp_matches_reference_formula_random():
    """zmp_chain vs a direct per-step Eigen-style recomputation."""
    rng = np.random.RandomState(0)
    p = default_params(np.float64)
    T, K = 7, 3
    states = rng.randn(T, K, 5) * 0.3
    controls = rng.randn(T - 1, K, 5) * 0.5
    dt = 0.08
    zmp = np.asarray(full_body.zmp_chain(jnp.array(states), jnp.array(controls), dt, p))

    g = np.array([0.0, 0.0, -9.8])
    z = np.array([0.0, 0.0, 1.0])
    inertia = np.asarray(p.inertia)
    m, c = float(p.mass), float(p.base2com)
    for k in range(K):
        for t in range(T - 2):
            da = (controls[t + 1, k, 0] - controls[t, k, 0]) / dt
            ac = controls[t, k, 0] * controls[t, k, 1]
            d = controls[t, k, 2]
            accel = np.array(
                [da * np.cos(d) - ac * np.sin(d), da * np.sin(d) + ac * np.cos(d), 0.0]
            )
            om1 = np.array(
                [controls[t + 1, k, 3], controls[t + 1, k, 4], controls[t + 1, k, 1]]
            )
            om0 = np.array([controls[t, k, 3], controls[t, k, 4], controls[t, k, 1]])
            hgd = (inertia * om1 - inertia * om0) / dt
            roll, pitch = states[t, k, 3], states[t, k, 4]
            com = np.array(
                [c * np.sin(pitch), -c * np.sin(roll), c * np.cos(pitch) * np.cos(roll)]
            )
            mo = np.cross(com, m * g) - np.cross(com, m * accel) - hgd
            ref = (np.cross(z, mo) / (m * np.dot(g - accel, z)))[:2]
            np.testing.assert_allclose(zmp[t, k], ref, rtol=1e-9, atol=1e-12)
