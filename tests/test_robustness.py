"""Endurance and robustness: long runs, wall-clock dt jitter, course end."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.metrics import tracking_metrics
from ccv_mppi_path_tracker_tpu.paths import PathBuffer, sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.runtime import ControlLoop, run_tracking_experiment


def test_long_run_stays_bounded():
    """500 cycles: no NaN drift, warm start bounded, tracking maintained."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=256)
    long_course = sum_of_cosines_course(
        amplitudes=(1.0, 0, 0), frequencies=(0.25, 0, 0), deltas=(0, 0, 0),
        resolution=0.1, course_length=60.0, dtype=np.float32,
    )
    out = run_tracking_experiment(cfg, sp, cp, long_course, num_steps=500)
    logs = out["logs"]
    assert np.isfinite(logs["state"]).all()
    assert np.isfinite(logs["u0"]).all()
    assert np.abs(logs["u0"][:, 0]).max() <= float(sp.u_max[0]) + 1e-5
    assert out["metrics"]["rmse"] < 0.15, out["metrics"]
    # covered most of the course
    assert logs["state"][-1, 0] > 30.0  # sinusoid arc length ~1.5x the x extent


def test_dt_jitter_no_recompile_and_tracks():
    """Wall-clock dt jitter (the reference's measured-dt regime,
    src/diff_drive_mppi.cpp:346-348) must not recompile or destabilize."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=256)
    path = PathBuffer.from_points(course, 0.1)
    loop = ControlLoop(cfg=cfg, sp=sp, cp=cp, path=path)
    from ccv_mppi_path_tracker_tpu.models import get_model

    plant = get_model(cfg.model)
    rng = np.random.RandomState(0)
    state = jnp.asarray([course[0, 0], course[0, 1], 0.0], jnp.float32)
    traj = [np.asarray(state)]
    for _ in range(80):
        dt = float(rng.uniform(0.08, 0.12))
        res = loop.step(state, dt=dt)
        state = plant.step(state, res.u0, jnp.float32(dt))
        traj.append(np.asarray(state))
    assert loop._step._cache_size() == 1  # dt is traced, never a recompile
    m = tracking_metrics(np.stack(traj)[:, :2], course)
    assert m["rmse"] < 0.2, m


def test_course_end_behavior():
    """Past the course end the reference window collapses to the last point;
    the controller slows toward it rather than diverging."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=256)
    short = course[:40]  # 4 m course
    out = run_tracking_experiment(cfg, sp, cp, short, num_steps=120)
    logs = out["logs"]
    assert np.isfinite(logs["state"]).all()
    end = short[-1]
    final_dist = np.hypot(*(logs["state"][-1, :2] - end))
    # parked near the course end (the v_ref term keeps some dithering)
    assert final_dist < 1.0, final_dist


def test_dkan_corridor_tracking():
    """The reference's building-corridor experiment
    (launch/dkan_diff_drive_mppi.launch): piecewise-linear course with 90-deg
    corners, tracked raw and with cubic-spline smoothing."""
    from ccv_mppi_path_tracker_tpu.paths import dkan_course, spline_resample_course

    cfg, sp, cp, _ = diff_drive_launch(num_samples=256)
    course = dkan_course(resolution=0.1).astype(np.float32)
    out = run_tracking_experiment(cfg, sp, cp, course, num_steps=200)
    # corners force deviation; bounded error and real progress required
    assert out["metrics"]["max_error"] < 0.6, out["metrics"]
    assert out["logs"]["state"][-1, 0] > 15.0

    smooth = spline_resample_course(
        [[0.0, 0.0], [8.0, 0.0], [17.7, 0.0], [17.7, 4.0], [17.7, 8.0],
         [9.0, 8.0], [0.0, 8.0]], resolution=0.1,
    ).astype(np.float32)
    out2 = run_tracking_experiment(cfg, sp, cp, smooth, num_steps=200)
    assert out2["metrics"]["rmse"] < 0.2, out2["metrics"]
