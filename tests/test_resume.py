"""Deterministic checkpoint/resume: interrupt + restore == uninterrupted run.

The failure-recovery story (SURVEY.md section 5): controller state is a tiny
pytree (warm-start sequence, PRNG key, cycle counter); restarting from a
checkpoint must reproduce the uninterrupted trajectory bit-for-bit.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.runtime import load_checkpoint, save_checkpoint
from ccv_mppi_path_tracker_tpu.solver import MPPISolver


def _run(solver, ctrl, state, path, sp, cp, n, dt):
    states = []
    for _ in range(n):
        ctrl, res = solver.step(ctrl, state, path, dt, sp, cp)
        from ccv_mppi_path_tracker_tpu.models import get_model

        state = get_model(solver.cfg.model).step(state, res.u0, dt)
        states.append(np.asarray(state))
    return ctrl, state, np.stack(states)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    cfg, sp, cp, course = diff_drive_launch(num_samples=128, horizon=10)
    path = PathBuffer.from_points(course, 0.1)
    dt = jnp.float32(0.1)
    state0 = jnp.asarray([course[0, 0], course[0, 1], 0.0], jnp.float32)

    # uninterrupted: 12 cycles
    solver = MPPISolver(cfg, donate=False)
    ctrl = solver.init(seed=7)
    _, _, full = _run(solver, ctrl, state0, path, sp, cp, 12, dt)

    # interrupted at cycle 5: checkpoint, "crash", restore, continue 7 more
    solver_a = MPPISolver(cfg, donate=False)
    ctrl_a = solver_a.init(seed=7)
    ctrl_a, state_a, first = _run(solver_a, ctrl_a, state0, path, sp, cp, 5, dt)
    ck = os.path.join(str(tmp_path), "ck.npz")
    save_checkpoint(ck, cfg, ctrl_a, sp=sp, cp=cp)
    np.save(os.path.join(str(tmp_path), "state.npy"), np.asarray(state_a))

    cfg_b, ctrl_b, trees = load_checkpoint(ck, sp=sp, cp=cp)
    solver_b = MPPISolver(cfg_b, donate=False)
    state_b = jnp.asarray(np.load(os.path.join(str(tmp_path), "state.npy")))
    _, _, rest = _run(
        solver_b, ctrl_b, state_b, path, trees["sp"], trees["cp"], 7, dt
    )

    np.testing.assert_array_equal(np.concatenate([first, rest]), full)
