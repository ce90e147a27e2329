"""Differentiable MPPI: gradients through the rollout scan.

The reference has no differentiable path (plain C++ loops). Here the whole
pipeline — Euler scan, ZMP chain, min-distance cost — is differentiable, so:

- d(cost)/d(controls) flows through ``lax.scan`` for gradient-refined updates
  (sampled MPPI update followed by a few projected-gradient steps);
- d(cost)/d(dynamics params) enables system identification (diff/system_id.py).

The min-distance term uses a soft selection under gradient: ``jnp.minimum``
running-min is piecewise differentiable (subgradient at ties), which matches
what autodiff of the reference's scan-min would give.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ccv_mppi_path_tracker_tpu.core.config import CostParams, SolverConfig, SolverParams
from ccv_mppi_path_tracker_tpu.core.types import RefWindow
from ccv_mppi_path_tracker_tpu.models.registry import get_model
from ccv_mppi_path_tracker_tpu.ops.costs import trajectory_costs
from ccv_mppi_path_tracker_tpu.ops.rollout import rollout


def make_trajectory_cost(cfg: SolverConfig):
    """Build a differentiable scalar cost of ONE control sequence.

    Returns ``cost(u_seq (T-1, U), state (S,), ref, dt, cp, model_params)``.
    Internally runs the batched pipeline with K=1 so the semantics are
    identical to the sampled solver's cost.
    """
    model = get_model(cfg.model)

    def cost_fn(u_seq, state, ref: RefWindow, dt, cp: CostParams, model_params=None):
        if model_params is None:
            model_params = model.default_params
        u = u_seq[:, None, :]  # (T-1, 1, U)
        states = rollout(model.step, state[None, :], u, dt)
        aux = {}
        if model.aux_from_rollout is not None:
            aux = model.aux_from_rollout(states, u, dt, model_params)
        return trajectory_costs(cfg.model, states, u, aux, ref, cp)[0]

    return cost_fn


def gradient_refine(
    cfg: SolverConfig,
    u_opt,
    state,
    ref: RefWindow,
    dt,
    sp: SolverParams,
    cp: CostParams,
    model_params=None,
    step_size: float = 0.05,
    num_steps: int = 5,
):
    """Polish the sampled MPPI update with projected gradient descent.

    u <- clip(u - step_size * dJ/du, bounds); the projection is the same box
    clamp as sampling. A few steps typically reduce the realized tracking
    cost beyond what K samples alone achieve (gradient-smoothed MPPI).
    """
    cost_fn = make_trajectory_cost(cfg)
    grad_fn = jax.grad(lambda u: cost_fn(u, state, ref, dt, cp, model_params))

    def body(_, u):
        g = grad_fn(u)
        return jnp.clip(u - step_size * g, sp.u_min, sp.u_max)

    return jax.lax.fori_loop(0, num_steps, body, u_opt)
