"""Differentiable path: gradient correctness, refinement, system ID."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
from ccv_mppi_path_tracker_tpu.diff import (
    fit_control_gains,
    fit_full_body_params,
    gradient_refine,
    make_trajectory_cost,
)
from ccv_mppi_path_tracker_tpu.core.types import RefWindow
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.models.full_body import default_params, zmp_chain


def _ref_window(T=15):
    xy = np.stack([np.arange(T) * 0.1, np.zeros(T)], -1)
    return RefWindow(xy=jnp.asarray(xy), yaw=jnp.zeros(T))


def test_trajectory_cost_gradient_matches_finite_difference():
    cfg, sp, cp, _ = diff_drive_launch(horizon=8, dtype=np.float64)
    cost_fn = make_trajectory_cost(cfg)
    ref = _ref_window(8)
    state = jnp.zeros(3, jnp.float64)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(7, 2) * 0.3)
    f = lambda u: cost_fn(u, state, ref, 0.1, cp)
    g = jax.grad(f)(u)
    # central finite differences on a few random entries
    eps = 1e-6
    for (i, j) in [(0, 0), (3, 1), (6, 0)]:
        up = u.at[i, j].add(eps)
        um = u.at[i, j].add(-eps)
        fd = (float(f(up)) - float(f(um))) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), fd, rtol=1e-5, atol=1e-7)


def test_gradient_refine_reduces_cost():
    cfg, sp, cp, _ = diff_drive_launch(horizon=10, dtype=np.float64)
    cost_fn = make_trajectory_cost(cfg)
    ref = _ref_window(10)
    state = jnp.asarray([0.0, 0.4, 0.5])  # off path, misaligned
    u0 = jnp.zeros((9, 2), jnp.float64)
    u1 = gradient_refine(cfg, u0, state, ref, 0.1, sp, cp, step_size=0.02, num_steps=10)
    c0 = float(cost_fn(u0, state, ref, 0.1, cp))
    c1 = float(cost_fn(u1, state, ref, 0.1, cp))
    assert c1 < c0
    # refined controls respect the box bounds
    assert float(jnp.max(u1[:, 0])) <= float(sp.u_max[0]) + 1e-12


def test_system_id_recovers_control_gains():
    """Generate transitions from a plant with droop gains; recover them."""
    rng = np.random.RandomState(1)
    true_gains = np.array([0.85, 1.1])
    m = get_model("unicycle")
    states = jnp.asarray(rng.randn(512, 3))
    controls = jnp.asarray(rng.randn(512, 2))
    next_states = m.step(states, controls * true_gains, 0.1)
    fitted, losses = fit_control_gains(
        "unicycle", states, controls, next_states, 0.1, num_steps=400
    )
    np.testing.assert_allclose(np.asarray(fitted.gains), true_gains, rtol=1e-3)
    assert float(losses[-1]) < float(losses[0]) * 1e-3


def test_system_id_full_body_zmp_params():
    """Fit CoM height from observed ZMP traces."""
    rng = np.random.RandomState(2)
    true = default_params(np.float64)
    perturbed = default_params(np.float64)
    import dataclasses as dc

    states = jnp.asarray(rng.randn(12, 64, 5) * 0.2)
    controls = jnp.asarray(rng.randn(11, 64, 5) * 0.5)
    observed = zmp_chain(states, controls, 0.1, true)[..., 1]
    init = dc.replace(perturbed, base2com=jnp.asarray(0.6, jnp.float64))
    fitted, losses = fit_full_body_params(
        states, controls, observed, 0.1, init, num_steps=500, learning_rate=0.02
    )
    np.testing.assert_allclose(
        float(fitted.base2com), float(true.base2com), rtol=0.02
    )
    assert float(losses[-1]) < float(losses[0]) * 1e-2


def test_system_id_data_parallel_matches_single():
    """pmean-reduced gradient over an 8-way mesh == single-device fit."""
    from ccv_mppi_path_tracker_tpu.parallel import samples_mesh
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(3)
    true_gains = np.array([0.9, 1.2])
    m = get_model("unicycle")
    states = jnp.asarray(rng.randn(256, 3))
    controls = jnp.asarray(rng.randn(256, 2))
    next_states = m.step(states, controls * true_gains, 0.1)

    single, _ = fit_control_gains(
        "unicycle", states, controls, next_states, 0.1, num_steps=100
    )

    mesh = samples_mesh(num_devices=8)
    sharded_fit = jax.jit(
        jax.shard_map(
            lambda s, c, n: fit_control_gains(
                "unicycle", s, c, n, 0.1, num_steps=100, axis_name="samples"
            )[0],
            mesh=mesh,
            in_specs=(P("samples"), P("samples"), P("samples")),
            out_specs=P(),
        )
    )
    dist = sharded_fit(states, controls, next_states)
    np.testing.assert_allclose(
        np.asarray(dist.gains), np.asarray(single.gains), rtol=1e-6
    )


def test_gradient_through_long_horizon():
    """d(cost)/d(controls) stays finite and correct-shaped at T=100."""
    from ccv_mppi_path_tracker_tpu.core.config import diff_drive_config

    cfg, sp, cp = diff_drive_config(num_samples=4, horizon=100, dtype=np.float64)
    cost_fn = make_trajectory_cost(cfg)
    ref = _ref_window(100)
    # generic controls: avoid rollouts collinear with the reference, where
    # the min-distance cost has exact ties (non-smooth points where FD and
    # the subgradient legitimately disagree)
    rng = np.random.RandomState(7)
    u = jnp.asarray(0.5 + 0.1 * rng.randn(99, 2))
    u = u.at[:, 1].set(0.2 * rng.randn(99))
    f = lambda u: cost_fn(u, jnp.zeros(3, jnp.float64), ref, 0.1, cp)
    g = jax.grad(f)(u)
    assert g.shape == (99, 2)
    assert np.isfinite(np.asarray(g)).all()
    # autodiff through the T=100 scan matches central finite differences
    eps = 1e-6
    for t, d in [(0, 0), (0, 1), (50, 0), (98, 0), (98, 1)]:
        up = u.at[t, d].add(eps)
        um = u.at[t, d].add(-eps)
        fd = (float(f(up)) - float(f(um))) / (2 * eps)
        np.testing.assert_allclose(float(g[t, d]), fd, rtol=1e-4, atol=1e-7)


def test_residuals_square_to_cost():
    """sum(residuals^2) == trajectory cost, unicycle and full_body."""
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.diff import make_trajectory_residuals

    rng = np.random.RandomState(0)
    for launch, udim, sdim in ((diff_drive_launch, 2, 3),
                               (full_body_launch, 5, 5)):
        cfg, sp, cp, _ = launch(horizon=10, dtype=np.float64)
        cost_fn = make_trajectory_cost(cfg)
        res_fn = make_trajectory_residuals(cfg)
        ref = _ref_window(10)
        state = jnp.zeros(sdim, jnp.float64)
        u = jnp.asarray(rng.randn(9, udim) * 0.3)
        c = float(cost_fn(u, state, ref, 0.1, cp))
        r = res_fn(u, state, ref, 0.1, cp)
        np.testing.assert_allclose(float(jnp.sum(r * r)), c, rtol=1e-9)


def test_gauss_newton_one_shots_quadratic_cost():
    """With path_weight=0 the cost is quadratic in v: one GN step lands at
    v_ref (the clipped least-squares optimum) where one GD step does not."""
    import dataclasses as dc

    from ccv_mppi_path_tracker_tpu.diff import gauss_newton_refine

    cfg, sp, cp, _ = diff_drive_launch(horizon=10, dtype=np.float64)
    cp = dc.replace(cp, path_weight=jnp.asarray(0.0, jnp.float64))
    ref = _ref_window(10)
    state = jnp.zeros(3, jnp.float64)
    u0 = jnp.zeros((9, 2), jnp.float64)
    u1 = gauss_newton_refine(cfg, u0, state, ref, 0.1, sp, cp,
                             num_steps=1, damping=1e-9)
    np.testing.assert_allclose(
        np.asarray(u1[:, 0]), float(cp.v_ref), rtol=1e-5
    )
    g1 = gradient_refine(cfg, u0, state, ref, 0.1, sp, cp,
                         step_size=0.02, num_steps=1)
    assert abs(float(g1[0, 0]) - float(cp.v_ref)) > 1e-2


def test_gauss_newton_reduces_tracking_cost():
    from ccv_mppi_path_tracker_tpu.diff import gauss_newton_refine

    cfg, sp, cp, _ = diff_drive_launch(horizon=10, dtype=np.float64)
    cost_fn = make_trajectory_cost(cfg)
    ref = _ref_window(10)
    state = jnp.asarray([0.0, 0.4, 0.5])  # off path, misaligned
    u0 = jnp.zeros((9, 2), jnp.float64)
    u1 = gauss_newton_refine(cfg, u0, state, ref, 0.1, sp, cp, num_steps=3)
    assert float(cost_fn(u1, state, ref, 0.1, cp)) < float(
        cost_fn(u0, state, ref, 0.1, cp)
    )
    assert float(jnp.max(u1[:, 0])) <= float(sp.u_max[0]) + 1e-12


def test_overlapped_grad_chunking_is_exact_and_sharded():
    """rollout_prediction_value_and_grad: bucketed per-chunk psums
    (num_chunks=4/8) must equal the sequential gradient, unsharded and
    under an 8-device shard_map — the fast CI counterpart of the real
    2-process case in tests/test_multiprocess.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ccv_mppi_path_tracker_tpu.diff.system_id import (
        ControlGains,
        rollout_prediction_value_and_grad,
    )
    from ccv_mppi_path_tracker_tpu.parallel import SAMPLES_AXIS, samples_mesh

    B, T = 128, 16
    rng = np.random.RandomState(3)
    state0 = jnp.zeros((B, 3))
    controls = jnp.asarray(rng.randn(T, B, 2) * 0.5)
    observed = jnp.asarray(rng.randn(T, B, 3) * 0.1)
    params = ControlGains(gains=jnp.asarray([1.1, 0.9]))
    dt = 0.1

    l1, g1 = rollout_prediction_value_and_grad(
        "unicycle", params, state0, controls, observed, dt
    )
    for nc in (4, 8):
        lc, gc = rollout_prediction_value_and_grad(
            "unicycle", params, state0, controls, observed, dt, num_chunks=nc
        )
        np.testing.assert_allclose(float(lc), float(l1), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(gc.gains), np.asarray(g1.gains), rtol=1e-12
        )

    mesh = samples_mesh(num_devices=8)
    for nc in (1, 4):
        fn = jax.jit(jax.shard_map(
            lambda p, s0, c, o: rollout_prediction_value_and_grad(
                "unicycle", p, s0, c, o, dt,
                axis_name=SAMPLES_AXIS, num_chunks=nc,
            ),
            mesh=mesh,
            in_specs=(P(), P(SAMPLES_AXIS, None), P(None, SAMPLES_AXIS, None),
                      P(None, SAMPLES_AXIS, None)),
            out_specs=(P(), P()),
        ))
        l8, g8 = fn(params, state0, controls, observed)
        np.testing.assert_allclose(float(l8), float(l1), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(g8.gains), np.asarray(g1.gains), rtol=1e-12
        )
