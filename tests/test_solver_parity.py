"""allclose parity: jitted solver vs the float64 NumPy oracle.

Identical standard-normal noise tensors are injected into both (the reference
RNG is unseedable, SURVEY.md section 2.1), and every pipeline intermediate the
oracle exposes is compared: reference window, rollout states, costs, weights,
and the optimal control sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_mppi_path_tracker_tpu.core import (
    ControllerState,
    diff_drive_config,
    full_body_config,
    steering_diff_drive_config,
)
from ccv_mppi_path_tracker_tpu.models.full_body import default_params
from ccv_mppi_path_tracker_tpu.oracle import oracle_step
from ccv_mppi_path_tracker_tpu.paths import PathBuffer, sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.solver import mppi_step

T = 12
K = 64
DT = 0.1
RESOLUTION = 0.1


def _course():
    return sum_of_cosines_course(
        amplitudes=(1.0, 0.3, 0.0),
        frequencies=(0.25, 0.5, 0.0),
        resolution=RESOLUTION,
        course_length=12.0,
    )


def _run_parity(model_name, make_cfg, state, u_prev_shape, model_params=None, **oracle_kw):
    cfg, sp, cp = make_cfg
    rng = np.random.RandomState(42)
    noise = rng.randn(T - 1, K, u_prev_shape[1])
    u_prev = rng.randn(*u_prev_shape) * 0.1
    course = _course()
    path = PathBuffer.from_points(course, RESOLUTION, dtype=np.float64)

    ctrl = ControllerState(
        u_prev=jnp.asarray(u_prev),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    _, res = jax.jit(
        lambda c, s, p, n: mppi_step(
            cfg, c, s, p, DT, sp, cp, model_params=model_params, noise=n
        )
    )(ctrl, jnp.asarray(state), path, jnp.asarray(noise))

    ora = oracle_step(
        model_name,
        u_prev,
        state,
        course,
        RESOLUTION,
        DT,
        noise,
        control_noise=0.5,
        lam=1.0,
        u_min=np.asarray(sp.u_min),
        u_max=np.asarray(sp.u_max),
        v_ref=float(cp.v_ref),
        **oracle_kw,
    )

    np.testing.assert_allclose(np.asarray(res.ref.xy), ora["ref_xy"], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res.ref.yaw)[:-1], ora["ref_yaw"][:-1], rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(res.u_opt), ora["u_opt"], rtol=1e-9, atol=1e-12)
    return res, ora


def test_diff_drive_parity():
    cfgs = diff_drive_config(num_samples=K, horizon=T, dtype=np.float64)
    state = np.array([0.3, -0.4, 0.2])
    _run_parity("unicycle", cfgs, state, (T - 1, 2))


def test_steering_parity():
    cfgs = steering_diff_drive_config(num_samples=K, horizon=T, dtype=np.float64)
    state = np.array([0.1, 0.2, -0.3])
    _run_parity("steering_unicycle", cfgs, state, (T - 1, 3))


@pytest.mark.parametrize("steer_off", [False, True])
def test_full_body_parity(steer_off):
    cfgs = full_body_config(
        num_samples=K, horizon=T, steer_off=steer_off, dtype=np.float64
    )
    state = np.array([0.0, -0.1, 0.15, 0.02, -0.03])
    p = default_params(np.float64)
    _run_parity(
        "full_body",
        cfgs,
        state,
        (T - 1, 5),
        model_params=p,
        steer_off=steer_off,
        mass=float(p.mass),
        base2com=float(p.base2com),
        inertia=np.asarray(p.inertia),
        gravity_z=float(p.gravity_z),
    )


def test_full_body_zmp_and_costs_parity():
    """Deeper intermediate check on the flagship model."""
    cfg, sp, cp = full_body_config(num_samples=8, horizon=T, dtype=np.float64)
    rng = np.random.RandomState(7)
    noise = rng.randn(T - 1, 8, 5)
    u_prev = rng.randn(T - 1, 5) * 0.1
    state = np.array([0.0, 0.0, 0.1, 0.05, -0.02])
    course = _course()
    path = PathBuffer.from_points(course, RESOLUTION, dtype=np.float64)
    p = default_params(np.float64)

    # re-run pieces by hand to extract costs: use the solver internals
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.ops import rollout, sample_controls, trajectory_costs
    from ccv_mppi_path_tracker_tpu.paths import resample_reference
    from ccv_mppi_path_tracker_tpu.models.full_body import zmp_chain

    u = sample_controls(jax.random.PRNGKey(0), jnp.asarray(u_prev), sp, 8,
                        noise=jnp.asarray(noise))
    m = get_model("full_body")
    states = rollout(m.step, jnp.broadcast_to(jnp.asarray(state), (8, 5)), u, DT)
    zmp = zmp_chain(states, u, DT, p)
    ref = resample_reference(path, jnp.asarray(state[:2]), cp.v_ref, DT, T)
    costs = trajectory_costs("full_body", states, u, {"zmp": zmp}, ref, cp)

    ora = oracle_step(
        "full_body", u_prev, state, course, RESOLUTION, DT, noise,
        control_noise=0.5, lam=1.0,
        u_min=np.asarray(sp.u_min), u_max=np.asarray(sp.u_max),
        v_ref=float(cp.v_ref),
        mass=float(p.mass), base2com=float(p.base2com),
        inertia=np.asarray(p.inertia), gravity_z=float(p.gravity_z),
    )
    np.testing.assert_allclose(
        np.asarray(states).transpose(1, 0, 2), ora["states"], rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(zmp).transpose(1, 0, 2), ora["zmp"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(costs), ora["costs"], rtol=1e-9)


def test_rate_limited_steering_parity():
    """Rate-limited steering family vs BOTH oracles (NumPy f64 + C++): the
    steering angle is a state slewed by the clipped commanded rate
    (models/rate_limited_steering.py; no reference counterpart — this family
    is named by BASELINE.json's config list)."""
    from ccv_mppi_path_tracker_tpu.core.config import rate_limited_steering_config
    from ccv_mppi_path_tracker_tpu.runtime.native import native_oracle_step

    cfgs = rate_limited_steering_config(num_samples=K, horizon=T, dtype=np.float64)
    state = np.array([0.1, -0.2, 0.15, 0.1])  # nonzero initial steer
    res, ora = _run_parity("rate_limited_steering", cfgs, state, (T - 1, 3))

    # C++ oracle agrees with both
    cfg, sp, cp = cfgs
    rng = np.random.RandomState(42)
    noise = rng.randn(T - 1, K, 3)
    u_prev = rng.randn(T - 1, 3) * 0.1
    cc = native_oracle_step(
        "rate_limited_steering", u_prev, state, _course(), RESOLUTION, DT,
        noise, control_noise=0.5, lam=1.0,
        u_min=np.asarray(sp.u_min), u_max=np.asarray(sp.u_max),
        v_ref=float(cp.v_ref), cp=cp,
    )
    np.testing.assert_allclose(cc["u_opt"], ora["u_opt"], rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(cc["costs"], ora["costs"], rtol=1e-12)
    # the steering state obeys both limits along every rollout
    from ccv_mppi_path_tracker_tpu.oracle.numpy_oracle import STEER_MAX

    assert np.abs(ora["states"][:, :, 3]).max() <= STEER_MAX + 1e-12
