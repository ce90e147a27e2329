"""Typed configuration for the MPPI solver.

Replaces the reference's ROS parameter-server plumbing (``nh_.param(...)`` calls
in the node constructors, e.g. src/diff_drive_mppi.cpp:17-34,
src/full_body_mppi.cpp:8-46) with two layers:

- :class:`SolverConfig` — *static* structure: model family, sample count K,
  horizon T, feature flags. Fields here select compiled program structure and
  are hashable so they can close over ``jax.jit``.
- :class:`SolverParams` / :class:`CostParams` — *traced* numeric parameters
  (noise scale, bounds, temperature, cost weights). These are pytrees passed
  into the jitted step, so retuning them never triggers recompilation, and the
  differentiable path can take gradients through them.

Defaults reproduce the reference node defaults exactly (file:line cited on
each constructor below).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import numpy as np


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree with all fields as children."""
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver structure. Hashable; closed over by jit.

    model: one of "unicycle", "steering_unicycle", "rate_limited_steering",
        "full_body".
    num_samples: K, rollouts per control step (reference ``num_samples``,
        src/diff_drive_mppi.cpp:19 / src/full_body_mppi.cpp:10).
    horizon: T, states per rollout; controls have length T-1 (reference
        ``horizon``, src/diff_drive_mppi.cpp:18).
    steer_off: zero the direction/steer control channel after sampling
        (reference src/full_body_mppi.cpp:517).
    """

    model: str = "unicycle"
    num_samples: int = 1000
    horizon: int = 15
    steer_off: bool = False

    @property
    def num_controls(self) -> int:
        # resolved through the registry so USER-REGISTERED models work
        # everywhere a SolverConfig does (examples/custom_model.py); lazy
        # import avoids a core <-> models import cycle
        from ccv_mppi_path_tracker_tpu.models.registry import get_model

        return get_model(self.model).num_controls

    @property
    def num_states(self) -> int:
        from ccv_mppi_path_tracker_tpu.models.registry import get_model

        return get_model(self.model).num_states


@_pytree_dataclass
@dataclasses.dataclass
class SolverParams:
    """Traced sampling/update parameters.

    control_noise: per-dim Gaussian sigma, shape (U,). The reference uses one
        scalar sigma for every control dim (src/diff_drive_mppi.cpp:20,89-90);
        we generalize to per-dim while keeping scalar-broadcast defaults.
    lam: softmax temperature lambda (src/diff_drive_mppi.cpp:21,219).
    u_min / u_max: box bounds per control dim, applied by clamping after the
        Gaussian draw (src/diff_drive_mppi.cpp:98-99).
    noise_beta: temporal correlation of the exploration noise in [0, 1):
        eps_t = beta*eps_{t-1} + sqrt(1-beta^2)*eta_t (low-frequency /
        colored sampling; see PAPERS.md "Low Frequency Sampling in MPPI").
        0 reproduces the reference's white noise exactly.
    """

    control_noise: jax.Array
    lam: jax.Array
    u_min: jax.Array
    u_max: jax.Array
    noise_beta: jax.Array


@_pytree_dataclass
@dataclasses.dataclass
class CostParams:
    """Traced cost weights; superset across the three model families.

    For unicycle / steering models only ``path_weight``, ``v_weight`` and
    ``v_ref`` are used (src/diff_drive_mppi.cpp:194-210). The full-body model
    adds the ZMP, roll-rate-smoothness, backward-motion and initial-yaw terms
    (src/full_body_mppi.cpp:404-424). The reference's ``roll_off`` flag is
    expressed by zeroing zmp_weight and roll_v_weight
    (src/full_body_mppi.cpp:43-46).
    """

    v_ref: jax.Array
    path_weight: jax.Array
    v_weight: jax.Array
    zmp_weight: jax.Array
    roll_v_weight: jax.Array
    back_weight: jax.Array
    yaw_weight: jax.Array


def _arr(x, dtype):
    return np.asarray(x, dtype=dtype)


def make_solver_params(
    control_noise,
    lam,
    u_min,
    u_max,
    noise_beta=0.0,
    dtype=np.float32,
) -> SolverParams:
    u_min = _arr(u_min, dtype)
    u_max = _arr(u_max, dtype)
    noise = np.broadcast_to(_arr(control_noise, dtype), u_min.shape).copy()
    return SolverParams(
        control_noise=noise,
        lam=_arr(lam, dtype),
        u_min=u_min,
        u_max=u_max,
        noise_beta=_arr(noise_beta, dtype),
    )


def make_cost_params(
    v_ref=0.8,
    path_weight=1.0,
    v_weight=1.0,
    zmp_weight=0.0,
    roll_v_weight=0.0,
    back_weight=0.0,
    yaw_weight=0.0,
    roll_off=False,
    dtype=np.float32,
) -> CostParams:
    if roll_off:  # src/full_body_mppi.cpp:43-46
        zmp_weight = 0.0
        roll_v_weight = 0.0
    return CostParams(
        v_ref=_arr(v_ref, dtype),
        path_weight=_arr(path_weight, dtype),
        v_weight=_arr(v_weight, dtype),
        zmp_weight=_arr(zmp_weight, dtype),
        roll_v_weight=_arr(roll_v_weight, dtype),
        back_weight=_arr(back_weight, dtype),
        yaw_weight=_arr(yaw_weight, dtype),
    )


_DEG = math.pi / 180.0


def diff_drive_config(
    num_samples: int = 1000,
    horizon: int = 15,
    control_noise: float = 0.5,
    lam: float = 1.0,
    v_max: float = 1.2,
    v_min: float = -1.2,
    w_max: float = 2.0,
    w_min: float = -2.0,
    v_ref: float = 0.8,
    path_weight: float = 1.0,
    v_weight: float = 1.0,
    dtype=np.float32,
) -> Tuple[SolverConfig, SolverParams, CostParams]:
    """Defaults of the diff-drive node ctor (src/diff_drive_mppi.cpp:17-34)."""
    cfg = SolverConfig(model="unicycle", num_samples=num_samples, horizon=horizon)
    sp = make_solver_params(
        control_noise, lam, [v_min, w_min], [v_max, w_max], dtype=dtype
    )
    cp = make_cost_params(
        v_ref=v_ref, path_weight=path_weight, v_weight=v_weight, dtype=dtype
    )
    return cfg, sp, cp


def steering_diff_drive_config(
    num_samples: int = 10000,
    horizon: int = 15,
    control_noise: float = 0.5,
    lam: float = 1.0,
    v_max: float = 1.2,
    v_min: float = -1.2,
    w_max: float = 1.0,
    w_min: float = -1.0,
    steer_max: float = 30.0 * _DEG,
    steer_min: float = -30.0 * _DEG,
    v_ref: float = 0.8,
    path_weight: float = 1.0,
    v_weight: float = 1.0,
    dtype=np.float32,
) -> Tuple[SolverConfig, SolverParams, CostParams]:
    """Defaults of the steering node ctor (src/steering_diff_drive_mppi.cpp:18-36)."""
    cfg = SolverConfig(
        model="steering_unicycle", num_samples=num_samples, horizon=horizon
    )
    sp = make_solver_params(
        control_noise,
        lam,
        [v_min, w_min, steer_min],
        [v_max, w_max, steer_max],
        dtype=dtype,
    )
    cp = make_cost_params(
        v_ref=v_ref, path_weight=path_weight, v_weight=v_weight, dtype=dtype
    )
    return cfg, sp, cp


def rate_limited_steering_config(
    num_samples: int = 10000,
    horizon: int = 15,
    control_noise: float = 0.5,
    lam: float = 1.0,
    v_max: float = 1.2,
    v_min: float = -1.2,
    w_max: float = 1.0,
    w_min: float = -1.0,
    steer_rate_max: float = 2.6,
    v_ref: float = 0.8,
    path_weight: float = 1.0,
    v_weight: float = 1.0,
    dtype=np.float32,
) -> Tuple[SolverConfig, SolverParams, CostParams]:
    """The BASELINE.json "steering-angle states + rate limits" family
    (models/rate_limited_steering.py); not present in the reference."""
    cfg = SolverConfig(
        model="rate_limited_steering", num_samples=num_samples, horizon=horizon
    )
    sp = make_solver_params(
        control_noise,
        lam,
        [v_min, w_min, -steer_rate_max],
        [v_max, w_max, steer_rate_max],
        dtype=dtype,
    )
    cp = make_cost_params(
        v_ref=v_ref, path_weight=path_weight, v_weight=v_weight, dtype=dtype
    )
    return cfg, sp, cp


def full_body_config(
    num_samples: int = 10000,
    horizon: int = 15,
    control_noise: float = 0.5,
    lam: float = 1.0,
    v_max: float = 1.2,
    v_min: float = -3.0,
    w_max: float = 1.0,
    w_min: float = -1.0,
    steer_max: float = 30.0 * _DEG,
    steer_min: float = -30.0 * _DEG,
    roll_v_max: float = 30.0 * _DEG,
    roll_v_min: float = -30.0 * _DEG,
    pitch_v_max: float = 15.0 * _DEG,
    pitch_v_min: float = -15.0 * _DEG,
    v_ref: float = 1.2,
    path_weight: float = 1.0,
    v_weight: float = 1.0,
    zmp_weight: float = 1.0,
    roll_v_weight: float = 1.0,
    back_weight: float = 1.0,
    yaw_weight: float = 1.0,
    roll_off: bool = False,
    steer_off: bool = False,
    dtype=np.float32,
) -> Tuple[SolverConfig, SolverParams, CostParams]:
    """Defaults of the full-body node ctor (src/full_body_mppi.cpp:8-46)."""
    cfg = SolverConfig(
        model="full_body",
        num_samples=num_samples,
        horizon=horizon,
        steer_off=steer_off,
    )
    sp = make_solver_params(
        control_noise,
        lam,
        [v_min, w_min, steer_min, roll_v_min, pitch_v_min],
        [v_max, w_max, steer_max, roll_v_max, pitch_v_max],
        dtype=dtype,
    )
    cp = make_cost_params(
        v_ref=v_ref,
        path_weight=path_weight,
        v_weight=v_weight,
        zmp_weight=zmp_weight,
        roll_v_weight=roll_v_weight,
        back_weight=back_weight,
        yaw_weight=yaw_weight,
        roll_off=roll_off,
        dtype=dtype,
    )
    return cfg, sp, cp
