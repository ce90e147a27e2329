"""Closed-loop runtime, metrics, recorder, checkpoint, estimation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.presets import (
    diff_drive_launch,
    full_body_launch,
    steering_launch,
)
from ccv_mppi_path_tracker_tpu.metrics import Recorder, read_log, tracking_metrics
from ccv_mppi_path_tracker_tpu.models.full_body import CONTACT_POSITIONS, default_params
from ccv_mppi_path_tracker_tpu.runtime import (
    ControlLoop,
    load_checkpoint,
    run_tracking_experiment,
    save_checkpoint,
)
from ccv_mppi_path_tracker_tpu.runtime.estimation import (
    gravity_compensate_accel,
    lowpass,
    model_zmp_estimate,
    quat_to_rpy,
    true_zmp_from_forces,
)
from ccv_mppi_path_tracker_tpu.paths import PathBuffer


def test_closed_loop_diff_drive_tracks_course():
    """Acceptance criterion (SURVEY.md section 4): RMSE below threshold on
    the launch-file sinusoid course."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=512)
    out = run_tracking_experiment(cfg, sp, cp, course, num_steps=100, seed=0)
    assert out["metrics"]["rmse"] < 0.15, out["metrics"]
    assert out["metrics"]["max_error"] < 0.35, out["metrics"]
    # made real progress along the course
    assert out["logs"]["state"][-1, 0] > 4.0


def test_closed_loop_steering_tracks_course():
    cfg, sp, cp, course = steering_launch(num_samples=512)
    out = run_tracking_experiment(cfg, sp, cp, course, num_steps=100, seed=0)
    assert out["metrics"]["rmse"] < 0.15, out["metrics"]


def test_closed_loop_full_body_tracks_course():
    cfg, sp, cp, course = full_body_launch(num_samples=512)
    out = run_tracking_experiment(cfg, sp, cp, course, num_steps=120, seed=0)
    assert out["metrics"]["rmse"] < 0.15, out["metrics"]
    assert np.isfinite(out["logs"]["ess"]).all()


def test_control_loop_host_driven():
    cfg, sp, cp, course = diff_drive_launch(num_samples=128)
    path = PathBuffer.from_points(course, 0.1)
    loop = ControlLoop(cfg=cfg, sp=sp, cp=cp, path=path)
    res = loop.step(np.array([0.0, 0.0, 0.0], np.float32), dt=0.1)
    assert res.u0.shape == (2,)
    res2 = loop.step(np.array([0.1, 0.0, 0.0], np.float32))  # wall-clock dt path
    assert np.isfinite(np.asarray(res2.u0)).all()
    assert int(loop.ctrl.step) == 2


def test_tracking_metrics_zero_on_path():
    course = np.stack([np.linspace(0, 5, 51), np.zeros(51)], -1)
    m = tracking_metrics(course[:20], course, dt=0.1)
    assert m["rmse"] == 0.0 and m["max_error"] == 0.0
    m2 = tracking_metrics(course[:20] + [0.0, 0.3], course, dt=0.1)
    np.testing.assert_allclose(m2["rmse"], 0.3, rtol=1e-9)


def test_recorder_roundtrip(tmp_path):
    from ccv_mppi_path_tracker_tpu.solver.command import WheelSteerCommand

    rec = Recorder(str(tmp_path), method="mppi", stamp="test")
    cmd = WheelSteerCommand(
        v=1.0, w=0.1, steer_l=0.02, steer_r=-0.02, roll=0.0, fore=0.05, rear=0.05
    )
    rec.write_cycle(0.0, np.array([1.0, 2.0, 0.3]), cmd, zmp_y=0.01)
    rec.write_cycle(0.1, np.array([1.1, 2.0, 0.3]), cmd)
    course = np.array([[0.0, 0.0], [1.0, 0.0]])
    rec.close(course)
    log = read_log(rec.path)
    assert log["data"].shape[0] == 2
    np.testing.assert_allclose(log["course"], course)
    assert log["header"][0] == "time"


def test_checkpoint_roundtrip(tmp_path):
    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.config import diff_drive_config

    cfg, sp, cp = diff_drive_config(num_samples=64, horizon=9, dtype=np.float64)
    ctrl = ControllerState(
        u_prev=jnp.arange(16, dtype=jnp.float64).reshape(8, 2),
        key=jax.random.PRNGKey(7),
        step=jnp.asarray(42, jnp.int32),
    )
    p = os.path.join(str(tmp_path), "ckpt.npz")
    save_checkpoint(p, cfg, ctrl, sp=sp, cp=cp)
    cfg2, ctrl2, trees = load_checkpoint(p, sp=sp, cp=cp)
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(ctrl2.u_prev), np.asarray(ctrl.u_prev))
    assert int(ctrl2.step) == 42
    np.testing.assert_array_equal(
        np.asarray(trees["sp"].u_min), np.asarray(sp.u_min)
    )
    # restored key produces identical noise
    a = jax.random.normal(ctrl.key, (4,))
    b = jax.random.normal(ctrl2.key, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quat_to_rpy_identity_and_yaw():
    r, p, y = quat_to_rpy(0.0, 0.0, 0.0, 1.0)
    assert float(r) == float(p) == float(y) == 0.0
    # pure yaw of 90 deg
    r, p, y = quat_to_rpy(0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4))
    np.testing.assert_allclose(float(y), np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose([float(r), float(p)], 0.0, atol=1e-7)


def test_gravity_compensation():
    accel = jnp.array([0.0, 0.0, 0.0])
    out = gravity_compensate_accel(accel, pitch=jnp.asarray(0.1))
    # accel_x -= g*sin(pitch) with g=-9.81 -> += 9.81*sin(0.1)
    np.testing.assert_allclose(float(out[0]), 9.81 * np.sin(0.1), rtol=1e-6)


def test_model_zmp_estimate_static():
    p = default_params(np.float64)
    zmp, hg = model_zmp_estimate(
        roll=jnp.asarray(0.0),
        pitch=jnp.asarray(0.0),
        omega=jnp.zeros(3),
        accel=jnp.zeros(3),
        last_hg=jnp.zeros(3),
        dt=0.1,
        params=p,
    )
    np.testing.assert_allclose(np.asarray(zmp), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hg), 0.0)


def test_true_zmp_from_forces():
    # all weight on the two wheels, symmetric -> ZMP at x=0, y=0
    forces = np.zeros((6, 3))
    forces[0] = [0.0, 0.0, 300.0]
    forces[1] = [0.0, 0.0, 300.0]
    zmp = true_zmp_from_forces(jnp.asarray(forces), jnp.zeros(3), alpha=1.0)
    np.testing.assert_allclose(np.asarray(zmp)[:2], [0.0, 0.0], atol=1e-12)
    # weight on left wheel only -> ZMP under it (y=0.225)
    forces2 = np.zeros((6, 3))
    forces2[0] = [0.0, 0.0, 600.0]
    zmp2 = true_zmp_from_forces(jnp.asarray(forces2), jnp.zeros(3), alpha=1.0)
    np.testing.assert_allclose(
        np.asarray(zmp2)[:2], CONTACT_POSITIONS[0][:2], atol=1e-9
    )
    # zero normal force -> previous value kept
    prev = jnp.array([0.5, 0.5, 0.0])
    zmp3 = true_zmp_from_forces(jnp.zeros((6, 3)), prev)
    np.testing.assert_array_equal(np.asarray(zmp3), np.asarray(prev))


def test_lowpass():
    np.testing.assert_allclose(float(lowpass(0.0, 1.0)), 0.3)


def test_control_loop_path_swap_no_recompile():
    """Swapping a same-capacity course mid-run reuses the compiled step."""
    import jax
    from ccv_mppi_path_tracker_tpu.paths import sum_of_cosines_course

    cfg, sp, cp, course = diff_drive_launch(num_samples=64)
    path_a = PathBuffer.from_points(course, 0.1)
    loop = ControlLoop(cfg=cfg, sp=sp, cp=cp, path=path_a)
    loop.step(np.zeros(3, np.float32), dt=0.1)
    compiles_before = loop._step._cache_size()
    course_b = sum_of_cosines_course(
        amplitudes=(0.5, 0, 0), frequencies=(0.2, 0, 0), deltas=(0, 0, 0),
        resolution=0.1, course_length=len(course) * 0.1,
    )[: len(course)]
    loop.set_path(PathBuffer.from_points(course_b, 0.1))
    res = loop.step(np.zeros(3, np.float32), dt=0.1)
    assert np.isfinite(np.asarray(res.u0)).all()
    assert loop._step._cache_size() == compiles_before


def test_rotate_force_to_base_matches_tf_basis():
    """Sensor->base rotation == tf basis matrix product (wrenchCallback,
    src/full_body_mppi.cpp:124-130), checked against scipy and batched."""
    from scipy.spatial.transform import Rotation
    from ccv_mppi_path_tracker_tpu.runtime.estimation import rotate_force_to_base

    rng = np.random.RandomState(0)
    rots = Rotation.from_euler("zyx", rng.randn(6, 3)).as_matrix()
    forces = rng.randn(6, 3)
    out = rotate_force_to_base(jnp.asarray(forces), jnp.asarray(rots))
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("cij,cj->ci", rots, forces), rtol=1e-6
    )
    # single (unbatched) call
    one = rotate_force_to_base(jnp.asarray(forces[0]), jnp.asarray(rots[0]))
    np.testing.assert_allclose(np.asarray(one), rots[0] @ forces[0], rtol=1e-6)


def test_control_loop_elite_stale_threads_threshold():
    """ControlLoop(solver_options={'elite_frac':.., 'elite_stale': True}):
    the loop holds the stale threshold between cycles — cycle 0 unmasked,
    cycle 1 masked at cycle 0's exact threshold (manual composition)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.runtime.loop import ControlLoop
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    cfg, sp, cp, course = diff_drive_launch(num_samples=256, horizon=8)
    path = PathBuffer.from_points(course, 0.1)
    loop = ControlLoop(cfg=cfg, sp=sp, cp=cp, path=path,
                       solver_options={"elite_frac": 0.25,
                                       "elite_stale": True})
    state = jnp.zeros(3, jnp.float32).at[1].set(float(course[0, 1]))
    r0 = loop.step(state, dt=0.1)
    r1 = loop.step(state, dt=0.1)

    ctrl0 = ControllerState.initial(jax.random.PRNGKey(0), 8, 2)
    ctrl, m0 = mppi_step(cfg, ctrl0, state, path, jnp.float32(0.1), sp, cp,
                         elite_frac=0.25, elite_stale_thresh=jnp.inf)
    _, m1 = mppi_step(cfg, ctrl, state, path, jnp.float32(0.1), sp, cp,
                      elite_frac=0.25,
                      elite_stale_thresh=m0.stats["elite_thresh"])
    np.testing.assert_allclose(np.asarray(r0.u0), np.asarray(m0.u0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r1.u0), np.asarray(m1.u0),
                               rtol=1e-6, atol=1e-7)
