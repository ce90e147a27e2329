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
    fl = total * (zmp_y - yr) / (yl - yr)
    fr = total - fl
    forces = jnp.zeros((len(contact_positions), 3), com.dtype)
    forces = forces.at[0, 2].set(fl)
    forces = forces.at[1, 2].set(fr)
    return forces
