"""Closed-loop receding-horizon drivers.

Two execution modes replace the reference's 10 Hz ``ros::Rate`` loop
(src/diff_drive_mppi.cpp:332-369):

- :func:`simulate_scan` — controller + plant fused into ONE jitted
  ``lax.scan``: the entire tracking experiment runs device-resident with no
  host round-trips. This is how the framework hits >100 Hz-equivalent
  replanning; it is also the benchmark workload.
- :class:`ControlLoop` — host-driven stepping for "real robot" usage: the
  host feeds measured state each cycle (with wall-clock-measured dt like the
  reference, :346-348) and reads back the actuator command.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.config import CostParams, SolverConfig, SolverParams
from ccv_mppi_path_tracker_tpu.core.types import ControllerState
from ccv_mppi_path_tracker_tpu.models.registry import get_model
from ccv_mppi_path_tracker_tpu.paths.resample import PathBuffer
from ccv_mppi_path_tracker_tpu.runtime.plant import Plant
from ccv_mppi_path_tracker_tpu.solver.mppi import mppi_step


def build_simulate_scan(
    cfg: SolverConfig,
    plant: Optional[Plant] = None,
    num_steps: int = 100,
    with_stats: bool = True,
    use_kernel: bool = False,
    solver_options: Optional[dict] = None,
    with_paths: bool = False,
):
    """Build a jitted closed-loop simulation.

    Returns ``sim(ctrl, state0, path, dt, sp, cp, model_params=None) ->
    (final ctrl, logs)`` where logs is a dict of stacked per-cycle arrays:
    states (N, S), u0 (N, U), and solver stats (N,).
    solver_options: extra keyword options forwarded to mppi_step each cycle
    (e.g. shift_warm_start=True, delay=..., elite_frac=..., refine_steps=...).
    with_paths: additionally log per-cycle planned xy paths — opt_xy (N, T, 2)
    and ref_xy (N, T, 2); combine with
    ``solver_options={"debug_candidates": M}`` (adds candidates (N, M, T, 2))
    to feed metrics/animate.py — the live-rviz-displays equivalent
    (config/config.rviz candidate/optimal/ref path topics).
    """
    if plant is None:
        plant = Plant(model_name=cfg.model)
    solver_options = dict(solver_options or {})
    # single-pass stale-threshold elite (solver/mppi.py elite_stale_thresh):
    # the scan carry threads each cycle's exact rank threshold into the
    # next cycle's weight mask; cycle 0 runs unmasked (+inf)
    elite_stale = solver_options.pop("elite_stale", False)
    assert not elite_stale or solver_options.get("elite_frac") is not None

    def sim(ctrl, state0, path, dt, sp, cp, model_params=None):
        def body(carry, _):
            if elite_stale:
                ctrl, state, thresh = carry
                opts = dict(solver_options, elite_stale_thresh=thresh)
            else:
                ctrl, state = carry
                opts = solver_options
            plant_key = jax.random.fold_in(ctrl.key, 1)
            ctrl, res = mppi_step(
                cfg, ctrl, state, path, dt, sp, cp, model_params=model_params,
                use_kernel=use_kernel, **opts,
            )
            state = plant.step(plant_key, state, res.u0, dt)
            log = {"state": state, "u0": res.u0}
            if with_stats:
                log.update(res.stats)
            if with_paths:
                log["opt_xy"] = res.opt_states[..., :2]
                log["ref_xy"] = res.ref.xy
            carry = ((ctrl, state, res.stats["elite_thresh"]) if elite_stale
                     else (ctrl, state))
            return carry, log

        carry0 = (ctrl, state0)
        if elite_stale:
            carry0 = carry0 + (jnp.asarray(jnp.inf, state0.dtype),)
        (ctrl, *_), logs = jax.lax.scan(body, carry0, None, length=num_steps)
        return ctrl, logs

    return jax.jit(sim)


@dataclasses.dataclass
class ControlLoop:
    """Host-driven control loop for live plants.

    Mirrors the reference run() loop: dt is measured wall-clock between
    cycles (src/diff_drive_mppi.cpp:346-348) and fed into the jitted step as
    a traced scalar, so jitter never recompiles.
    """

    cfg: SolverConfig
    sp: SolverParams
    cp: CostParams
    path: PathBuffer
    model_params: object = None
    nominal_dt: float = 0.1
    # Covariance-adaptive importance sampling (PAPERS.md: "MPPI using
    # Covariance Variable Importance Sampling"): EMA coefficient feeding the
    # solver's weighted-sample std back into control_noise each cycle.
    # 0 = reference semantics (fixed sigma). Sigma values are traced, so
    # adaptation never recompiles.
    sigma_adapt: float = 0.0
    sigma_bounds: tuple = (0.25, 4.0)  # clip range, x initial sigma
    # Extra keyword options forwarded to mppi_step each cycle (e.g.
    # shift_warm_start=True, delay=0.02, elite_frac=0.1, refine_steps=3).
    solver_options: Optional[dict] = None

    def __post_init__(self):
        # path/params are traced arguments, not closures: a new course of the
        # same buffer capacity (the reference republishes /reference_path
        # every tick) or retuned weights swap in without recompiling.
        opts = dict(self.solver_options or {})
        # single-pass stale-threshold elite (solver/mppi.py): the loop holds
        # the threshold between cycles and threads it as a traced argument
        self._elite_stale = opts.pop("elite_stale", False)
        assert not self._elite_stale or opts.get("elite_frac") is not None
        if self._elite_stale:
            self._thresh = jnp.asarray(jnp.inf, jnp.float32)
            self._step = jax.jit(
                lambda ctrl, state, path, dt, sp, cp, thresh: mppi_step(
                    self.cfg, ctrl, state, path, dt, sp, cp,
                    model_params=self.model_params,
                    adapt_sigma=self.sigma_adapt > 0,
                    elite_stale_thresh=thresh,
                    **opts,
                )
            )
        else:
            self._step = jax.jit(
                lambda ctrl, state, path, dt, sp, cp: mppi_step(
                    self.cfg, ctrl, state, path, dt, sp, cp,
                    model_params=self.model_params,
                    adapt_sigma=self.sigma_adapt > 0,
                    **opts,
                )
            )
        self._sigma0 = np.asarray(self.sp.control_noise)
        self._last_time = None
        model = get_model(self.cfg.model)
        self.ctrl = ControllerState.initial(
            jax.random.PRNGKey(0), self.cfg.horizon, model.num_controls
        )

    def set_path(self, path: PathBuffer):
        """Swap the reference course (recompile-free at equal capacity)."""
        self.path = path
        if self._elite_stale:
            # the old course's cost threshold is meaningless on the new
            # one — run the next cycle unmasked, per the first-cycle
            # contract (prevents an arbitrary/empty stale mask)
            self._thresh = jnp.asarray(jnp.inf, jnp.float32)

    def measure_dt(self) -> float:
        now = time.monotonic()
        if self._last_time is None:
            dt = self.nominal_dt
        else:
            dt = now - self._last_time
        self._last_time = now
        return dt

    def step(self, state, dt: Optional[float] = None):
        """One control cycle: returns the StepResult for the measured state."""
        if dt is None:
            dt = self.measure_dt()
        state = jnp.asarray(state, dtype=self.ctrl.u_prev.dtype)
        if self._elite_stale:
            self.ctrl, res = self._step(
                self.ctrl, state, self.path, jnp.asarray(dt, state.dtype),
                self.sp, self.cp, self._thresh,
            )
            self._thresh = res.stats["elite_thresh"]
        else:
            self.ctrl, res = self._step(
                self.ctrl, state, self.path, jnp.asarray(dt, state.dtype),
                self.sp, self.cp,
            )
        if self.sigma_adapt > 0:
            a = self.sigma_adapt
            sigma = (1 - a) * np.asarray(self.sp.control_noise) + a * np.asarray(
                res.stats["sigma_suggest"]
            )
            lo, hi = self.sigma_bounds
            sigma = np.clip(sigma, lo * self._sigma0, hi * self._sigma0)
            self.sp = dataclasses.replace(
                self.sp, control_noise=jnp.asarray(sigma)
            )
        return res


def run_tracking_experiment(
    cfg,
    sp,
    cp,
    course: np.ndarray,
    num_steps: int = 200,
    dt: float = 0.1,
    plant: Optional[Plant] = None,
    model_params=None,
    seed: int = 0,
    start_on_course: bool = True,
    dtype=np.float32,
    use_kernel: bool = False,
    resolution: float = 0.1,
    ctrl: Optional[ControllerState] = None,
    state0=None,
    solver_options: Optional[dict] = None,
    with_paths: bool = False,
):
    """Run a full tracking experiment via the fused scan; return logs + metrics.

    The start pose defaults to the first course point, aligned with the
    initial course heading (the reference spawns the robot on the course in
    its Gazebo worlds). ``resolution`` is the course generator's sample
    parameter (the reference's ``resolution`` ROS param, 0.1 by default for
    every course here) — it sets the reference-window stride, NOT the arc
    length; pass None to infer the median segment length instead.
    ``ctrl``/``state0`` override the fresh warm start / start pose — pass a
    restored ControllerState (runtime/checkpoint.py) to resume a run.
    """
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics

    model = get_model(cfg.model)
    if resolution is None:
        resolution = _infer_resolution(course)
    path = PathBuffer.from_points(course, resolution, dtype=dtype)
    if state0 is None:
        state0 = np.zeros(model.num_states, dtype)
        if start_on_course:
            state0[0], state0[1] = course[0]
            state0[2] = np.arctan2(
                course[1, 1] - course[0, 1], course[1, 0] - course[0, 0]
            )
    else:
        state0 = np.asarray(state0, dtype)
    if ctrl is None:
        ctrl = ControllerState.initial(
            jax.random.PRNGKey(seed), cfg.horizon, model.num_controls, dtype=dtype
        )
    sim = build_simulate_scan(
        cfg, plant=plant, num_steps=num_steps, use_kernel=use_kernel,
        solver_options=solver_options, with_paths=with_paths,
    )
    ctrl, logs = sim(
        ctrl, jnp.asarray(state0), path, jnp.asarray(dt, dtype), sp, cp, model_params
    )
    logs = jax.tree.map(np.asarray, logs)
    xy = np.concatenate([state0[None, :2], logs["state"][:, :2]], axis=0)
    metrics = tracking_metrics(xy, course, dt=dt)
    return {"logs": logs, "metrics": metrics, "course": course,
            "state0": state0, "ctrl": ctrl}


def _infer_resolution(course: np.ndarray) -> float:
    seg = np.hypot(*np.diff(course[: min(len(course), 50)], axis=0).T)
    return float(np.median(seg))
