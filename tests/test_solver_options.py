"""Solver execution options: gradient refinement, large-horizon sharded sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.diff.gradients import make_trajectory_cost
from ccv_mppi_path_tracker_tpu.parallel import build_sharded_step, samples_mesh
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.solver import mppi_step


def test_refined_step_reduces_realized_cost():
    cfg, sp, cp, course = diff_drive_launch(num_samples=64, horizon=12,
                                            dtype=np.float64)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    ctrl = ControllerState(
        u_prev=jnp.zeros((11, 2), jnp.float64),
        key=jax.random.PRNGKey(5),
        step=jnp.zeros((), jnp.int32),
    )
    state = jnp.asarray([0.0, course[0, 1] + 0.3, 0.5])  # off path
    dt = jnp.asarray(0.1, jnp.float64)
    noise = jnp.asarray(np.random.RandomState(0).randn(11, 64, 2))

    _, plain = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, refined = mppi_step(
        cfg, ctrl, state, path, dt, sp, cp, noise=noise,
        refine_steps=8, refine_step_size=0.02,
    )
    cost_fn = make_trajectory_cost(cfg)
    c_plain = float(cost_fn(plain.u_opt, state, plain.ref, dt, cp))
    c_ref = float(cost_fn(refined.u_opt, state, refined.ref, dt, cp))
    assert c_ref < c_plain
    # refinement respects the bounds
    assert float(jnp.max(refined.u_opt[:, 0])) <= float(sp.u_max[0]) + 1e-12


def test_large_horizon_sharded_sweep():
    """CI-scale version of the K=100k x T=100 multi-host sweep config:
    K=8192 sharded over 8 virtual devices at T=100."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=8192, horizon=100)
    path = PathBuffer.from_points(course, 0.1)
    mesh = samples_mesh(num_devices=8)
    step = build_sharded_step(cfg, mesh)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), 100, 2)
    state = jnp.zeros(3, jnp.float32).at[1].set(float(course[0, 1]))
    ctrl, res = step(ctrl, state, path, jnp.float32(0.1), sp, cp)
    assert res.u_opt.shape == (99, 2)
    assert np.isfinite(np.asarray(res.u_opt)).all()
    assert 1.0 <= float(res.stats["ess"]) <= 8192.0


def test_refine_preserves_steer_off():
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.core.config import SolverConfig

    cfg, sp, cp, course = full_body_launch(num_samples=64, horizon=10,
                                           dtype=np.float64)
    cfg = SolverConfig(model=cfg.model, num_samples=64, horizon=10,
                       steer_off=True)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    ctrl = ControllerState(
        u_prev=jnp.zeros((9, 5), jnp.float64),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    state = jnp.zeros(5, jnp.float64).at[1].set(course[0, 1])
    _, res = mppi_step(cfg, ctrl, state, path, jnp.asarray(0.1, jnp.float64),
                       sp, cp, refine_steps=5)
    np.testing.assert_array_equal(np.asarray(res.u_opt[:, 2]), 0.0)
