"""Full-stack full-body simulation: synthetic sensors -> estimators -> solver.

Mirrors the reference's complete Gazebo pipeline (SURVEY.md section 3.2):
ground-truth plant, synthesized IMU + contact-force measurements, the
estimation adapters (gravity compensation, model ZMP + low-pass, force-sensor
true ZMP), and the controller consuming the *estimated* state.
"""

import numpy as np

from ccv_mppi_path_tracker_tpu.runtime.sim_sensors import (
    run_full_stack_experiment as _run_stack,
)


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
