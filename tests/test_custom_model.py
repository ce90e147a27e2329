"""Extensibility proof: a FIFTH, user-registered dynamics model
(examples/custom_model.py kinematic bicycle) traverses every major surface
— single-device step, use_kernel="auto" XLA fallback, the sharded path with
bit-tight single-vs-8-device agreement, and a closed loop with tracking
RMSE — with zero framework-core edits. (The reference's only extension
mechanism was copy-pasting a whole controller node,
src/steering_diff_drive_mppi.cpp.)
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples"),
)

import custom_model as cm  # noqa: E402  (registers kinematic_bicycle)

from ccv_mppi_path_tracker_tpu.core import ControllerState  # noqa: E402
from ccv_mppi_path_tracker_tpu.models import get_model  # noqa: E402
from ccv_mppi_path_tracker_tpu.solver import MPPISolver, mppi_step  # noqa: E402


def test_registration_and_config_resolution():
    m = get_model("kinematic_bicycle")
    assert m is cm.BICYCLE
    cfg, sp, cp, course, path = cm.make_problem(num_samples=64, horizon=8)
    # SolverConfig resolves S/U through the registry for custom models
    assert (cfg.num_states, cfg.num_controls) == (3, 2)


def test_auto_kernel_falls_back_to_xla():
    from ccv_mppi_path_tracker_tpu.kernels import should_use_kernel

    assert not should_use_kernel(
        1 << 20, 30, backend="tpu", model="kinematic_bicycle"
    )
    cfg, *_ = cm.make_problem(num_samples=1 << 14, horizon=30)
    solver = MPPISolver(cfg, use_kernel="auto")
    assert solver.use_kernel is False


def test_single_device_step_and_sharded_match():
    from ccv_mppi_path_tracker_tpu.parallel import (
        build_sharded_step,
        samples_mesh,
    )

    K, T = 256, 10
    cfg, sp, cp, course, path = cm.make_problem(num_samples=K, horizon=T)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), T, 2)
    state = jnp.asarray([0.0, float(course[0, 1]), 0.0], jnp.float32)
    noise = jnp.asarray(
        np.random.RandomState(3).randn(T - 1, K, 2), jnp.float32
    )
    dt = jnp.float32(0.1)
    _, res1 = jax.jit(
        lambda c, s, n: mppi_step(cfg, c, s, path, dt, sp, cp, noise=n)
    )(ctrl, state, noise)
    assert res1.u_opt.shape == (T - 1, 2)
    assert np.isfinite(np.asarray(res1.u_opt)).all()

    mesh = samples_mesh(num_devices=8)
    step8 = build_sharded_step(cfg, mesh)
    _, res8 = step8(ctrl, state, path, dt, sp, cp, noise=noise)
    np.testing.assert_allclose(
        np.asarray(res8.u_opt), np.asarray(res1.u_opt), rtol=1e-6, atol=1e-7
    )


def test_closed_loop_tracks():
    m = cm.closed_loop_rmse(steps=100, num_samples=1024, horizon=16)
    assert m["rmse"] < 0.15, m
    assert m["max_error"] < 0.35, m
