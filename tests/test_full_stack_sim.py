"""Full-stack full-body simulation: synthetic sensors -> estimators -> solver.

Mirrors the reference's complete Gazebo pipeline (SURVEY.md section 3.2):
ground-truth plant, synthesized IMU + contact-force measurements, the
estimation adapters (gravity compensation, model ZMP + low-pass, force-sensor
true ZMP), and the controller consuming the *estimated* state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
from ccv_mppi_path_tracker_tpu.metrics import tracking_metrics
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.models.full_body import default_params
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.runtime.estimation import (
    gravity_compensate_accel,
    lowpass,
    model_zmp_estimate,
    true_zmp_from_forces,
)
from ccv_mppi_path_tracker_tpu.runtime.sim_sensors import (
    sim_contact_forces,
    sim_imu,
)
from ccv_mppi_path_tracker_tpu.solver import MPPISolver


def _run_stack(roll_off: bool, cycles: int = 80):
    cfg, sp, cp, course = full_body_launch(num_samples=256, roll_off=roll_off)
    path = PathBuffer.from_points(course, 0.1)
    params = default_params(np.float32)
    solver = MPPISolver(cfg, donate=False)
    ctrl = solver.init(seed=0)
    plant = get_model("full_body")
    dt = jnp.float32(0.1)

    slope = float(np.arctan2(course[1, 1] - course[0, 1],
                             course[1, 0] - course[0, 0]))
    truth = jnp.asarray([course[0, 0], course[0, 1], slope, 0.0, 0.0],
                        jnp.float32)
    u_prev_cmd = jnp.zeros(5, jnp.float32)
    last_hg = jnp.zeros(3, jnp.float32)
    zmp_est = jnp.zeros(2, jnp.float32)
    true_zmp = jnp.zeros(3, jnp.float32)

    traj, zmps, true_zmps = [np.asarray(truth)], [], []
    key = jax.random.PRNGKey(0)
    for i in range(cycles):
        key, nk = jax.random.split(key)
        # --- sensing (synthetic Gazebo) --------------------------------
        imu = sim_imu(truth, u_prev_cmd, u_prev_cmd, dt, noise_key=nk,
                      accel_noise=0.02, gyro_noise=0.005)
        forces = sim_contact_forces(truth, imu["accel_base"], params)
        # --- estimation (runtime/estimation.py) ------------------------
        accel = gravity_compensate_accel(imu["accel_base"], imu["pitch"])
        accel = accel.at[2].set(0.0)  # reference zeroes a_z (:555)
        zmp_new, last_hg = model_zmp_estimate(
            imu["roll"], imu["pitch"], imu["omega"], accel, last_hg, dt, params
        )
        zmp_est = lowpass(zmp_est, zmp_new)
        true_zmp = true_zmp_from_forces(forces, true_zmp)
        est_state = jnp.stack(
            [truth[0], truth[1], imu["yaw"], imu["roll"], imu["pitch"]]
        )
        # --- control on the ESTIMATED state ----------------------------
        ctrl, res = solver.step(ctrl, est_state, path, dt, sp, cp)
        u_prev_cmd = res.u0
        truth = plant.step(truth, res.u0, dt)
        traj.append(np.asarray(truth))
        zmps.append(float(zmp_est[1]))
        true_zmps.append(float(true_zmp[1]))

    traj = np.stack(traj)
    return {
        "metrics": tracking_metrics(traj[:, :2], course),
        "traj": traj,
        "zmp": np.asarray(zmps),
        "true_zmp": np.asarray(true_zmps),
    }


def test_full_stack_estimation_in_the_loop():
    out = _run_stack(roll_off=True)
    m = out["metrics"]
    assert m["rmse"] < 0.2, m
    assert out["traj"][-1, 0] > 5.0
    assert np.isfinite(out["zmp"]).all() and np.isfinite(out["true_zmp"]).all()
    # the two ZMP estimates agree in steady state (quasi-static correlation)
    assert np.max(np.abs(out["zmp"][20:] - out["true_zmp"][20:])) < 0.08


def test_zmp_cost_reduces_lateral_zmp():
    """The reference's controlled-vs-uncontrolled experiment
    (log/full_body/robo_sym/{controlled,uncontrolled}.png): enabling the ZMP
    cost (roll_off=False -> zmp_weight=10) must shrink the peak lateral ZMP
    relative to the uncontrolled run on the same course."""
    uncontrolled = _run_stack(roll_off=True)
    controlled = _run_stack(roll_off=False)
    peak_u = np.max(np.abs(uncontrolled["true_zmp"][5:]))
    peak_c = np.max(np.abs(controlled["true_zmp"][5:]))
    assert peak_c < peak_u, (peak_c, peak_u)
    # and the controlled robot still tracks
    assert controlled["metrics"]["rmse"] < 0.3, controlled["metrics"]
