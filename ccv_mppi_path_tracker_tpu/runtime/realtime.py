"""Real-time host execution: native scheduler + gate + recorder + TPU solver.

The production-shaped equivalent of the reference's node main loop
(ros::Rate(10) + spinOnce + publish, src/diff_drive_mppi.cpp:332-369): the
native absolute-deadline RateExecutor paces the cycle, the InputGate makes
stale-input policy explicit, the jitted solver produces the command, the
command geometry maps it to actuators, and the native background-thread CSV
recorder logs without blocking the control path. Deadline-miss and jitter
statistics come back with the results — the reference silently slips.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.config import CostParams, SolverConfig, SolverParams
from ccv_mppi_path_tracker_tpu.metrics.recorder import COLUMNS
from ccv_mppi_path_tracker_tpu.models.registry import get_model
from ccv_mppi_path_tracker_tpu.paths.resample import PathBuffer
from ccv_mppi_path_tracker_tpu.runtime.gating import InputGate
from ccv_mppi_path_tracker_tpu.runtime.loop import ControlLoop
from ccv_mppi_path_tracker_tpu.solver.command import (
    MODE_NO_NEED,
    command_from_solution,
    steering_mode,
)


def run_realtime_experiment(
    cfg: SolverConfig,
    sp: SolverParams,
    cp: CostParams,
    course: np.ndarray,
    hz: float = 10.0,
    num_cycles: int = 100,
    record_path: Optional[str] = None,
    model_params=None,
    resolution: float = 0.1,
    lean: bool = True,
    use_kernel: bool = False,
):
    """Track ``course`` at a fixed wall-clock rate with an in-process plant.

    Returns {"metrics", "rate_stats", "logs"}. The plant is stepped with the
    measured dt (like the real robot integrating in real time).
    lean: run the solver in serving mode (StepResult carries only u_opt/u0;
    the control path here reads nothing else) — saves ~0.1 ms/cycle of
    output-buffer allocation at large K (solver/mppi.py ``lean``).
    use_kernel: solve via the fused Pallas kernel (TPU serving path).
    """
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.runtime.native import (
        NativeCsvRecorder,
        RateExecutor,
    )

    path = PathBuffer.from_points(course, resolution, dtype=np.float32)
    opts = {}
    if lean:
        opts["lean"] = True
    if use_kernel:
        opts["use_kernel"] = True
    loop = ControlLoop(
        cfg=cfg, sp=sp, cp=cp, path=path, model_params=model_params,
        nominal_dt=1.0 / hz, solver_options=opts or None,
    )
    model = get_model(cfg.model)
    plant = get_model(cfg.model)

    gate = InputGate(stale_policy="hold")
    gate.add_channel("pose", max_age=3.0 / hz)

    rec = None
    if record_path is not None:
        rec = NativeCsvRecorder(record_path, COLUMNS)

    slope = math.atan2(course[1, 1] - course[0, 1], course[1, 0] - course[0, 0])
    state = jnp.asarray(
        [course[0, 0], course[0, 1], slope] + [0.0] * (model.num_states - 3),
        jnp.float32,
    )
    # Warm up (compile) before the schedule starts, then reset the controller
    # so the first real cycle is both on time and from a clean warm start.
    from ccv_mppi_path_tracker_tpu.core.types import ControllerState
    import jax as _jax

    loop.step(state, dt=1.0 / hz)
    loop.ctrl = ControllerState.initial(
        _jax.random.PRNGKey(0), cfg.horizon, model.num_controls
    )
    loop._last_time = None

    rate = RateExecutor(hz)
    last_cmd = None
    traj = [np.asarray(state)]
    t = 0.0
    invalid_steer_cycles = 0
    for _ in range(num_cycles):
        dt = rate.sleep()
        gate.update("pose", state)
        res = loop.step(gate.get("pose"), dt=dt)
        cmd = command_from_solution(cfg.model, res.u0, dt)
        cmd = gate.resolve_command(cmd, last_cmd if last_cmd is not None else cmd)
        last_cmd = cmd
        # the reference flags opposite-sign measured steer angles on every
        # joint-state message (src/steering_diff_drive_mppi.cpp:75-76)
        if int(steering_mode(cmd.steer_r, cmd.steer_l)) == MODE_NO_NEED:
            invalid_steer_cycles += 1
        state = plant.step(state, res.u0, jnp.float32(dt))
        traj.append(np.asarray(state))
        t += dt
        if rec is not None:
            s = np.asarray(state)
            rec.row([
                t, s[0], s[1], float(cmd.w), s[2], s[0], s[1], float(cmd.v),
                float(cmd.v), float(cmd.steer_r), float(cmd.steer_l),
                float(cmd.roll), 0.0, 0.0, np.nan, np.nan,
            ])
    if rec is not None:
        rec.close()
    traj = np.stack(traj)
    return {
        "metrics": tracking_metrics(traj[:, :2], course, dt=1.0 / hz),
        "rate_stats": rate.stats(),
        "logs": {"state": traj},
        "stale_cycles": gate.stale_cycles,
        "invalid_steer_cycles": invalid_steer_cycles,
    }
