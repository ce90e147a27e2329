"""Learned update rule (L2O) — PAPERS.md "Learning to Optimize in Model
Predictive Control"."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.diff import (
    UpdateRule,
    evaluate_rule,
    learned_update_step,
    learned_weights,
    meta_train,
)
from ccv_mppi_path_tracker_tpu.ops.softmax_update import softmax_weights
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.solver import mppi_step


def test_identity_rule_weights_are_mppi_softmax():
    costs = jnp.asarray(np.random.RandomState(0).rand(64) * 50, jnp.float32)
    rule = UpdateRule.init_identity(jax.random.PRNGKey(3), u_dim=2)
    w_learned = learned_weights(rule, costs, 2.0)
    w_vanilla, _ = softmax_weights(costs, 2.0)
    np.testing.assert_allclose(
        np.asarray(w_learned), np.asarray(w_vanilla), rtol=1e-6
    )


def test_identity_rule_step_matches_vanilla_mppi():
    """With identical injected noise the identity rule's update equals the
    classic solver's update (same sampling, same softmax, gain 1)."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=128, horizon=10)
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.asarray([0.0, float(course[0, 1]), 0.0], jnp.float32)
    dt = jnp.float32(0.1)
    rng = np.random.RandomState(1)
    noise = jnp.asarray(
        rng.randn(cfg.horizon - 1, cfg.num_samples, 2), jnp.float32
    )
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), cfg.horizon, 2)
    rule = UpdateRule.init_identity(jax.random.PRNGKey(5), u_dim=2)

    _, res_vanilla = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, res_learned = learned_update_step(
        cfg, rule, ctrl, state, path, dt, sp, cp, noise=noise
    )
    np.testing.assert_allclose(
        np.asarray(res_learned.u_opt), np.asarray(res_vanilla.u_opt),
        rtol=1e-5, atol=1e-6,
    )


def test_meta_trained_rule_beats_vanilla_update():
    """After meta-training, the learned rule reaches a lower realized cost
    than the vanilla update at the SAME sample/iteration budget, on
    held-out randomized poses."""
    cfg, sp, cp, course = diff_drive_launch(num_samples=64, horizon=8)
    rule, losses = meta_train(
        cfg, sp, cp, course, jax.random.PRNGKey(0),
        num_steps=120, batch=32, iterations=2,
    )
    assert losses[-1] < losses[0], "meta-training failed to reduce the loss"

    held_out = jax.random.PRNGKey(1234)
    vanilla = evaluate_rule(cfg, None, sp, cp, course, held_out, iterations=2)
    learned = evaluate_rule(cfg, rule, sp, cp, course, held_out, iterations=2)
    assert learned < vanilla, (
        f"learned update {learned:.3f} not better than vanilla {vanilla:.3f}"
    )
