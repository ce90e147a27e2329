"""NumPy restatement of the reference C++ MPPI semantics, for parity tests.

This module follows the *reference pipeline* (src/diff_drive_mppi.cpp,
src/steering_diff_drive_mppi.cpp, src/full_body_mppi.cpp) step by step in
float64, with noise injected as an argument — the reference reseeds
``std::mt19937`` from ``std::random_device`` every cycle
(src/diff_drive_mppi.cpp:83-84), so identical noise tensors are the only way
to compare trajectories.

Two documented divergences from the literal C++ (shared with the solver, so
solver == oracle exactly):

1. Cost / update index ranges. The C++ reads control entries at t = T-1,
   one past the end of the (T-1)-length vectors (undefined behavior; see
   SURVEY.md section 2.1). Both oracle and solver define the velocity/control
   terms over the T-1 valid entries and the path term over all T states.
2. Softmax baseline. The C++ exponentiates raw costs
   (src/diff_drive_mppi.cpp:219); we subtract the min cost — mathematically
   identical whenever the C++ result is finite.
"""

from __future__ import annotations

import numpy as np

DIST_CAP = 100.0


def _clamp(x, lo, hi):
    return np.minimum(np.maximum(x, lo), hi)


def _nearest_index(path_xy, pos):
    d = np.sqrt(np.sum((path_xy - pos) ** 2, axis=-1))
    best = int(np.argmin(d))
    return best if d[best] < DIST_CAP else 0


def _calc_ref(path_xy, pos, v_ref, dt, resolution, horizon):
    cur = _nearest_index(path_xy, pos)
    step = v_ref * dt / resolution
    idx = np.minimum(
        cur + np.floor(np.arange(horizon) * step).astype(int), len(path_xy) - 1
    )
    xy = path_xy[idx]
    yaw = np.zeros(horizon)
    for i in range(horizon - 1):
        yaw[i] = np.arctan2(xy[i + 1, 1] - xy[i, 1], xy[i + 1, 0] - xy[i, 0])
    yaw[horizon - 1] = yaw[horizon - 2]
    return xy, yaw


def _min_sq_distance(x, y, ref_xy):
    """clamp(min_j |p - ref_j|^2) via the reference's LITERAL difference
    form (calc_MinDistance, src/diff_drive_mppi.cpp:183-192, squared; cap at
    100 m). Deliberately NOT the solver/kernel/C++-oracle centered
    expanded form (ops/mindist.py): this oracle stays algebraically
    independent of the optimized formulation so a shared error in that
    algebra cannot pass the parity suite (ADVICE r3)."""
    dx = x - ref_xy[:, 0]
    dy = y - ref_xy[:, 1]
    return min(DIST_CAP * DIST_CAP, float(np.min(dx * dx + dy * dy)))


# rate-limited steering slew limits — single source of truth is the model
# module; re-declaring them here risked silent drift if the model is retuned
from ccv_mppi_path_tracker_tpu.models.rate_limited_steering import (  # noqa: E402
    RATE_MAX,
    STEER_MAX,
)


def _rollout_sample(model, state, u, dt):
    """Euler rollout of one sample; u is (T-1, U). Returns (T, S)."""
    horizon = u.shape[0] + 1
    s = np.zeros((horizon, state.shape[0]))
    s[0] = state
    for t in range(horizon - 1):
        x, y, yaw = s[t, 0], s[t, 1], s[t, 2]
        if model == "unicycle":
            heading = yaw
        elif model == "rate_limited_steering":
            # position integrates with the CURRENT steering angle state;
            # u[t, 2] is the steering RATE, slewed and box-limited
            heading = yaw + s[t, 3]
        else:
            heading = yaw + u[t, 2]
        s[t + 1, 0] = x + u[t, 0] * np.cos(heading) * dt
        s[t + 1, 1] = y + u[t, 0] * np.sin(heading) * dt
        s[t + 1, 2] = yaw + u[t, 1] * dt
        if model == "full_body":
            s[t + 1, 3] = s[t, 3] + u[t, 3] * dt
            s[t + 1, 4] = s[t, 4] + u[t, 4] * dt
        elif model == "rate_limited_steering":
            rate = min(max(u[t, 2], -RATE_MAX), RATE_MAX)
            s[t + 1, 3] = min(max(s[t, 3] + rate * dt, -STEER_MAX), STEER_MAX)
    return s


def _zmp_sample(states, u, dt, mass, base2com, inertia, gravity_z):
    """Per-step ZMP for one full-body sample (src/full_body_mppi.cpp:468-486)."""
    horizon = states.shape[0]
    zmp = np.zeros((horizon - 2, 2))
    g = np.array([0.0, 0.0, gravity_z])
    z = np.array([0.0, 0.0, 1.0])
    inertia = np.asarray(inertia)
    for t in range(horizon - 2):
        drive_accel = (u[t + 1, 0] - u[t, 0]) / dt
        ac = u[t, 0] * u[t, 1]
        d = u[t, 2]
        ax = drive_accel * np.cos(d) - ac * np.sin(d)
        ay = drive_accel * np.sin(d) + ac * np.cos(d)
        accel = np.array([ax, ay, 0.0])
        omega_next = np.array([u[t + 1, 3], u[t + 1, 4], u[t + 1, 1]])
        omega = np.array([u[t, 3], u[t, 4], u[t, 1]])
        hg_dot = (inertia * omega_next - inertia * omega) / dt
        roll, pitch = states[t, 3], states[t, 4]
        com = np.array(
            [
                base2com * np.sin(pitch),
                -base2com * np.sin(roll),
                base2com * np.cos(pitch) * np.cos(roll),
            ]
        )
        m_o = np.cross(com, mass * g) - np.cross(com, mass * accel) - hg_dot
        zmp_vec = np.cross(z, m_o) / (mass * np.dot(g - accel, z))
        zmp[t] = zmp_vec[:2]
    return zmp


def oracle_step(
    model: str,
    u_prev,
    state,
    path_xy,
    resolution,
    dt,
    noise,
    control_noise,
    lam,
    u_min,
    u_max,
    v_ref,
    path_weight=1.0,
    v_weight=1.0,
    zmp_weight=1.0,
    roll_v_weight=1.0,
    back_weight=1.0,
    yaw_weight=1.0,
    steer_off=False,
    mass=60.0,
    base2com=0.8075 / 2.0,
    inertia=None,
    gravity_z=-9.8,
):
    """One full MPPI cycle at C++ semantics. noise: (T-1, K, U) std normals."""
    u_prev = np.asarray(u_prev, np.float64)
    state = np.asarray(state, np.float64)
    path_xy = np.asarray(path_xy, np.float64)
    noise = np.asarray(noise, np.float64)
    tm1, num_samples, u_dim = noise.shape
    horizon = tm1 + 1

    if inertia is None and model == "full_body":
        m, h, d, w, c = mass, 0.8075, 0.208, 0.208, base2com
        inertia = [
            m * (w * w + h * h) / 12.0 + m * c * c,
            m * (h * h + d * d) / 12.0 + m * c * c,
            m * (d * d + w * w) / 12.0,
        ]

    # 1. Sampling (src/diff_drive_mppi.cpp:81-102)
    u = u_prev[:, None, :] + noise * control_noise
    u = _clamp(u, np.asarray(u_min), np.asarray(u_max))
    if steer_off:
        u[:, :, 2] = 0.0

    # reference window (calc_RefPath)
    ref_xy, ref_yaw = _calc_ref(path_xy, state[:2], v_ref, dt, resolution, horizon)

    # 2-3. Rollout + cost per sample
    states = np.zeros((num_samples, horizon, state.shape[0]))
    zmps = None
    if model == "full_body":
        zmps = np.zeros((num_samples, horizon - 2, 2))
    costs = np.zeros(num_samples)
    for i in range(num_samples):
        s = _rollout_sample(model, state, u[:, i, :], dt)
        states[i] = s
        cost = 0.0
        if model == "full_body":
            zmp = _zmp_sample(s, u[:, i, :], dt, mass, base2com, inertia, gravity_z)
            zmps[i] = zmp
            cost += yaw_weight * (s[0, 2] - ref_yaw[0]) ** 2
            for t in range(horizon - 2):
                cost += path_weight * _min_sq_distance(
                    s[t, 0], s[t, 1], ref_xy
                )
                cost += v_weight * (u[t, i, 0] - v_ref) ** 2
                cost += zmp_weight * zmp[t, 1] ** 2
                cost += roll_v_weight * (u[t + 1, i, 3] - u[t, i, 3]) ** 2
                if u[t, i, 0] < 0.0:
                    cost += back_weight * u[t, i, 0] ** 2
        else:
            for t in range(horizon):
                cost += path_weight * _min_sq_distance(
                    s[t, 0], s[t, 1], ref_xy
                )
                if t < horizon - 1:
                    cost += v_weight * (u[t, i, 0] - v_ref) ** 2
        costs[i] = cost

    # 4. Weights (min-baseline softmax; see module docstring)
    w = np.exp(-(costs - costs.min()) / lam)
    weights = w / w.sum()

    # 5. Weighted update (determine_OptimalSolution)
    u_opt = np.einsum("k,tku->tu", weights, u)

    return {
        "u_samples": u,
        "states": states,
        "costs": costs,
        "weights": weights,
        "u_opt": u_opt,
        "ref_xy": ref_xy,
        "ref_yaw": ref_yaw,
        "zmp": zmps,
    }
