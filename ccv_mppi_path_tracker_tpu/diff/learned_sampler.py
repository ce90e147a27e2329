"""Learned sampling distribution: a neural warm start for MPPI.

Implements the idea of PAPERS.md "Learning Sampling Distributions for Model
Predictive Control": learn a state-conditioned proposal mean so sampling
centers on a good sequence even without a warm start (cold start, reset,
or path switch), instead of the zero/previous-solution center the reference
uses (src/diff_drive_mppi.cpp:86-91).

The proposal is a small MLP mapping the reference window expressed in the
robot frame (translation + rotation invariant features) to a control
sequence. It is trained by imitation: solve MPPI from randomized states,
regress the converged update. At control time pass its output as the
sampling center (``ControllerState.u_prev``) for the first cycle.

Everything is plain jax + optax pytrees — no framework dependency.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccv_mppi_path_tracker_tpu.core.config import SolverConfig
from ccv_mppi_path_tracker_tpu.core.types import ControllerState
from ccv_mppi_path_tracker_tpu.models.registry import get_model


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass
class SamplerNet:
    """MLP parameters: features -> flattened (T-1, U) proposal mean."""

    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array

    @staticmethod
    def init(key, in_dim: int, hidden: int, out_dim: int, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        s1 = jnp.sqrt(2.0 / in_dim).astype(dtype)
        s2 = jnp.sqrt(2.0 / hidden).astype(dtype)
        return SamplerNet(
            w1=jax.random.normal(k1, (in_dim, hidden), dtype) * s1,
            b1=jnp.zeros(hidden, dtype),
            w2=jax.random.normal(k2, (hidden, out_dim), dtype) * s2,
            b2=jnp.zeros(out_dim, dtype),
        )

    def __call__(self, feats):
        h = jnp.tanh(feats @ self.w1 + self.b1)
        return h @ self.w2 + self.b2


def proposal_features(state, ref):
    """Robot-frame reference window: invariant to world translation/yaw.

    state: (S,) with (x, y, yaw) leading; ref: RefWindow with xy (T, 2) and
    yaw (T,). Returns (3T,) = relative xy (rotated into the robot frame) and
    heading errors.
    """
    c, s = jnp.cos(state[2]), jnp.sin(state[2])
    rot = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
    rel = (ref.xy - state[:2]) @ rot.T  # (T, 2) in robot frame
    dyaw = ref.yaw - state[2]
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
    return jnp.concatenate([rel.reshape(-1), dyaw])


def proposal_mean(net: SamplerNet, cfg: SolverConfig, state, ref):
    """State-conditioned sampling center, clipped later by the solver."""
    u_dim = get_model(cfg.model).num_controls
    return net(proposal_features(state, ref)).reshape(cfg.horizon - 1, u_dim)


def collect_imitation_data(
    cfg, sp, cp, course, key, num_states: int = 128, solve_cycles: int = 8,
    dt: float = 0.1, lateral_spread: float = 0.5, yaw_spread: float = 0.5,
):
    """Solve MPPI from randomized poses near the course; return (feats, u).

    Each datum is the converged (``solve_cycles`` warm-started solves at a
    frozen pose) update for one randomized start — the imitation target.
    """
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    model = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    dtj = jnp.float32(dt)

    def solve_one(key):
        ka, kb, kc, kd = jax.random.split(key, 4)
        i = jax.random.randint(ka, (), 0, len(course) - 2)
        base = jnp.asarray(course, jnp.float32)[i]
        nxt = jnp.asarray(course, jnp.float32)[i + 1]
        yaw0 = jnp.arctan2(nxt[1] - base[1], nxt[0] - base[0])
        state = jnp.zeros(model.num_states, jnp.float32)
        state = state.at[0].set(base[0])
        state = state.at[1].set(
            base[1] + lateral_spread * jax.random.normal(kb, (), state.dtype)
        )
        state = state.at[2].set(
            yaw0 + yaw_spread * jax.random.normal(kc, (), state.dtype)
        )

        ctrl = ControllerState(
            u_prev=jnp.zeros((cfg.horizon - 1, model.num_controls), jnp.float32),
            key=kd,
            step=jnp.zeros((), jnp.int32),
        )

        def body(ctrl, _):
            ctrl, res = mppi_step(cfg, ctrl, state, path, dtj, sp, cp)
            return ctrl, None

        ctrl, _ = jax.lax.scan(body, ctrl, None, length=solve_cycles)
        ref = resample_reference(path, state[:2], cp.v_ref, dtj, cfg.horizon)
        return proposal_features(state, ref), ctrl.u_prev

    keys = jax.random.split(key, num_states)
    return jax.jit(jax.vmap(solve_one))(keys)


def fit_sampler(
    feats, targets, key, hidden: int = 64, num_steps: int = 500,
    learning_rate: float = 1e-3,
):
    """Regress proposal means from features (MSE, adam). Returns (net, losses)."""
    n, in_dim = feats.shape
    out_dim = targets.reshape(n, -1).shape[1]
    net = SamplerNet.init(key, in_dim, hidden, out_dim, feats.dtype)
    y = targets.reshape(n, -1)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(net)

    def loss_fn(net):
        pred = net(feats)
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(net, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    losses = []
    for _ in range(num_steps):
        net, opt_state, loss = step(net, opt_state)
        losses.append(float(loss))
    return net, np.asarray(losses)
