"""Learned sampling distribution (neural warm start) — PAPERS.md
"Learning Sampling Distributions for Model Predictive Control"."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.diff import (
    collect_imitation_data,
    fit_sampler,
    proposal_mean,
)
from ccv_mppi_path_tracker_tpu.diff.learned_sampler import proposal_features
from ccv_mppi_path_tracker_tpu.core.types import RefWindow
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
from ccv_mppi_path_tracker_tpu.solver import mppi_step


def test_proposal_features_invariant_to_world_pose():
    """Features depend only on the course relative to the robot."""
    xy = np.stack([np.linspace(0, 1.4, 15), 0.1 * np.arange(15)], -1)
    ref = RefWindow(xy=jnp.asarray(xy, jnp.float32),
                    yaw=jnp.asarray(np.full(15, 0.2), jnp.float32))
    state = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    f0 = proposal_features(state, ref)
    # translate + rotate the whole world by (tx, ty, a)
    tx, ty, a = 3.0, -2.0, 0.7
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s], [s, c]])
    ref2 = RefWindow(
        xy=jnp.asarray(xy @ rot.T + [tx, ty], jnp.float32),
        yaw=jnp.asarray(np.full(15, 0.2 + a), jnp.float32),
    )
    state2 = jnp.asarray([tx, ty, a], jnp.float32)
    f2 = proposal_features(state2, ref2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f0), atol=1e-5)


def test_learned_proposal_beats_cold_start():
    """Sampling centered on the learned proposal achieves a lower
    first-cycle cost than a zero-centered cold start, on held-out poses."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=256, horizon=10)
    key = jax.random.PRNGKey(0)
    feats, targets = collect_imitation_data(
        cfg, sp, cp, course, key, num_states=96, solve_cycles=6,
    )
    net, losses = fit_sampler(feats, targets, jax.random.PRNGKey(1),
                              hidden=32, num_steps=300)
    assert losses[-1] < losses[0] * 0.5

    path = PathBuffer.from_points(course, 0.1)
    dt = jnp.float32(0.1)
    rng = np.random.RandomState(7)
    wins = 0
    trials = 6
    for i in range(trials):
        j = rng.randint(0, len(course) - 2)
        yaw0 = np.arctan2(course[j + 1, 1] - course[j, 1],
                          course[j + 1, 0] - course[j, 0])
        state = jnp.asarray([
            course[j, 0], course[j, 1] + rng.randn() * 0.3,
            yaw0 + rng.randn() * 0.3,
        ], jnp.float32)
        ref = resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
        u_net = proposal_mean(net, cfg, state, ref)
        u_net = jnp.clip(u_net, sp.u_min, sp.u_max)

        def first_cost(u_prev, seed):
            ctrl = ControllerState(
                u_prev=u_prev, key=jax.random.PRNGKey(seed),
                step=jnp.zeros((), jnp.int32),
            )
            _, res = mppi_step(cfg, ctrl, state, path, dt, sp, cp)
            return float(res.stats["min_cost"])

        cold = first_cost(jnp.zeros_like(u_net), 100 + i)
        warm = first_cost(u_net, 100 + i)
        wins += warm <= cold
    assert wins >= trials - 1, f"learned proposal won only {wins}/{trials}"
