"""Dynamics-parameter system identification by backprop through rollouts.

Given observed transitions from a real/simulated plant, fit differentiable
dynamics parameters by gradient descent on one-step (or multi-step) state
prediction error. Two parameterizations:

- :class:`ControlGains` — per-channel actuator gains applied to the commanded
  controls (models droop/scaling miscalibration of the kinematic models);
- :class:`FullBodyParams` fitting (mass / CoM height) against observed ZMP.

Both losses are data-parallel: under a mesh the per-shard gradient is psum'd
(``axis_name``), the pattern the dry-run multichip entry exercises.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ccv_mppi_path_tracker_tpu.models.full_body import FullBodyParams, zmp_chain
from ccv_mppi_path_tracker_tpu.models.registry import get_model


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass
class ControlGains:
    gains: jax.Array  # (U,)


def gained_step(model_name: str):
    """Model step with learnable control gains: u_eff = gains * u."""
    step = get_model(model_name).step

    def f(params: ControlGains, state, u, dt):
        return step(state, u * params.gains, dt)

    return f


def prediction_loss(model_name, params, states_t, controls_t, states_t1, dt,
                    axis_name: Optional[str] = None):
    """Mean one-step prediction error over a batch of observed transitions."""
    pred = gained_step(model_name)(params, states_t, controls_t, dt)
    err = pred - states_t1
    loss = jnp.mean(jnp.sum(err * err, axis=-1))
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def fit_control_gains(
    model_name: str,
    states_t,
    controls_t,
    states_t1,
    dt,
    num_steps: int = 300,
    learning_rate: float = 0.1,
    axis_name: Optional[str] = None,
    init: Optional[ControlGains] = None,
):
    """Recover per-channel control gains from observed transitions."""
    u_dim = controls_t.shape[-1]
    if init is None:
        init = ControlGains(gains=jnp.ones((u_dim,), states_t.dtype))
    opt = optax.adam(learning_rate)

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(
            lambda p: prediction_loss(
                model_name, p, states_t, controls_t, states_t1, dt, axis_name
            )
        )(params)
        if axis_name is not None:
            # data-parallel gradient all-reduce (the MPPI "training" collective)
            g = jax.lax.pmean(g, axis_name)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=num_steps
    )
    return params, losses


def zmp_loss(params: FullBodyParams, states, controls, observed_zmp_y, dt,
             axis_name: Optional[str] = None):
    """MSE of predicted vs observed lateral ZMP over rollouts.

    states (T, B, 5), controls (T-1, B, 5), observed_zmp_y (T-2, B).
    """
    zmp = zmp_chain(states, controls, dt, params)
    err = zmp[..., 1] - observed_zmp_y
    loss = jnp.mean(err * err)
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def fit_full_body_params(
    states,
    controls,
    observed_zmp_y,
    dt,
    init: FullBodyParams,
    num_steps: int = 300,
    learning_rate: float = 0.02,
    axis_name: Optional[str] = None,
):
    """Fit (mass, base2com) of the ZMP model; inertia/gravity held fixed."""
    opt = optax.adam(learning_rate)
    trainable = ("mass", "base2com")

    def mask_grad(g: FullBodyParams) -> FullBodyParams:
        return FullBodyParams(
            mass=g.mass,
            base2com=g.base2com,
            inertia=jnp.zeros_like(g.inertia),
            gravity_z=jnp.zeros_like(g.gravity_z),
        )

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(
            lambda p: zmp_loss(p, states, controls, observed_zmp_y, dt, axis_name)
        )(params)
        g = mask_grad(g)
        if axis_name is not None:
            g = jax.lax.pmean(g, axis_name)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=num_steps
    )
    return params, losses
