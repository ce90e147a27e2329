"""Synthetic sensors: the Gazebo side of the reference, as pure functions.

The reference's full-body node estimates its state from Gazebo topics — IMU
orientation/rates/accels (imuCallback, src/full_body_mppi.cpp:199-237) and
six contact force sensors (wrenchCallback :115-156, calc_true_ZMP :569-596).
This module synthesizes those measurements from plant truth so the complete
sensing -> estimation -> control stack runs in simulation:

    plant state + commands --sim_imu/sim_contact_forces--> measurements
    measurements --runtime/estimation.py--> estimated state + ZMP
    estimated state --solver--> commands
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.models.full_body import (
    CONTACT_POSITIONS,
    FullBodyParams,
    com_position,
)


def sim_imu(state, u, u_prev, dt, noise_key=None, accel_noise=0.0,
            gyro_noise=0.0, g=-9.81):
    """Synthesize IMU readings from full-body plant truth.

    state: (5,) = (x, y, yaw, roll, pitch); u/u_prev: (5,) current and
    previous applied controls. Returns dict(roll, pitch, yaw, omega (3,),
    accel_base (3,)) where accel_base contains the gravity leakage the
    estimator is expected to compensate (estimation.gravity_compensate_accel
    removes -g*sin(pitch) from x).
    """
    yaw, roll, pitch = state[2], state[3], state[4]
    v, w = u[0], u[1]
    direction = u[2]
    drive_accel = (u[0] - u_prev[0]) / dt
    ac = v * w
    ax = drive_accel * jnp.cos(direction) - ac * jnp.sin(direction)
    ay = drive_accel * jnp.sin(direction) + ac * jnp.cos(direction)
    # gravity leakage into body x for a pitched IMU (small-angle model the
    # reference compensates at src/full_body_mppi.cpp:234)
    accel = jnp.stack([ax + g * jnp.sin(pitch), ay, jnp.zeros_like(ax)])
    omega = jnp.stack([u[3], u[4], w])
    if noise_key is not None and (accel_noise or gyro_noise):
        k1, k2 = jax.random.split(noise_key)
        accel = accel + accel_noise * jax.random.normal(k1, (3,), accel.dtype)
        omega = omega + gyro_noise * jax.random.normal(k2, (3,), omega.dtype)
    return {
        "roll": roll, "pitch": pitch, "yaw": yaw,
        "omega": omega, "accel_base": accel,
    }


def sim_contact_forces(state, accel, params: FullBodyParams,
                       contact_positions=CONTACT_POSITIONS):
    """Synthesize the six contact-sensor forces for a quasi-static robot.

    Distributes weight + inertial reaction so the force-sensor ZMP
    (estimation.true_zmp_from_forces) reproduces the model ZMP: total normal
    force N = m*|g|, split between left/right wheels so the moment about x
    matches the lateral ZMP. Casters carry nothing (worst case). Returns
    (C, 3) forces in the base frame.
    """
    m = params.mass
    gmag = -params.gravity_z
    com = com_position(state[3], state[4], params)
    # lateral ZMP of the quasi-static model (hg_dot = 0)
    bz = m * params.gravity_z
    by = -m * accel[1]
    mo_x = com[1] * bz - com[2] * by
    zmp_y = mo_x / bz
    yl = contact_positions[0][1]
    yr = contact_positions[1][1]
    total = m * gmag
    # solve fl*yl + fr*yr = total*zmp_y, fl + fr = total
    # yl/yr may be strongly-typed np.float64 scalars; keep the scatter dtype
    # consistent with the force buffer even under jax_enable_x64.
    fl = jnp.asarray(total * (zmp_y - yr) / (yl - yr), com.dtype)
    fr = jnp.asarray(total, com.dtype) - fl
    forces = jnp.zeros((len(contact_positions), 3), com.dtype)
    forces = forces.at[0, 2].set(fl)
    forces = forces.at[1, 2].set(fr)
    return forces


def run_full_stack_experiment(roll_off: bool = False, cycles: int = 80,
                              num_samples: int = 256, seed: int = 0):
    """Complete sensing -> estimation -> control pipeline on the full-body
    launch preset — the framework's equivalent of the reference's Gazebo
    experiment (SURVEY.md section 3.2; the controlled-vs-uncontrolled ZMP
    comparison of log/full_body/robo_sym/{controlled,uncontrolled}.png uses
    roll_off=False vs True).

    Returns {"metrics", "traj" (cycles+1, 5), "zmp" (cycles,),
    "true_zmp" (cycles,)} with the controller consuming the ESTIMATED state
    (noisy IMU + force sensors through runtime/estimation.py).
    """
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
    from ccv_mppi_path_tracker_tpu.solver import MPPISolver

    cfg, sp, cp, course = full_body_launch(
        num_samples=num_samples, roll_off=roll_off
    )
    path = PathBuffer.from_points(course, 0.1)
    params = default_params(jnp.float32)
    solver = MPPISolver(cfg, donate=False)
    ctrl = solver.init(seed=seed)
    plant = get_model("full_body")
    dt = jnp.float32(0.1)

    slope = float(jnp.arctan2(course[1, 1] - course[0, 1],
                              course[1, 0] - course[0, 0]))
    truth = jnp.asarray([course[0, 0], course[0, 1], slope, 0.0, 0.0],
                        jnp.float32)
    u_prev_cmd = jnp.zeros(5, jnp.float32)
    last_hg = jnp.zeros(3, jnp.float32)
    zmp_est = jnp.zeros(2, jnp.float32)
    true_zmp = jnp.zeros(3, jnp.float32)

    traj, zmps, true_zmps = [np.asarray(truth)], [], []
    key = jax.random.PRNGKey(seed)
    for _ in range(cycles):
        key, nk = jax.random.split(key)
        # --- sensing (synthetic Gazebo) --------------------------------
        imu = sim_imu(truth, u_prev_cmd, u_prev_cmd, dt, noise_key=nk,
                      accel_noise=0.02, gyro_noise=0.005)
        forces = sim_contact_forces(truth, imu["accel_base"], params)
        # --- estimation (runtime/estimation.py) ------------------------
        accel = gravity_compensate_accel(imu["accel_base"], imu["pitch"])
        accel = accel.at[2].set(0.0)  # reference zeroes a_z (:555)
        zmp_new, last_hg = model_zmp_estimate(
            imu["roll"], imu["pitch"], imu["omega"], accel, last_hg, dt,
            params,
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
