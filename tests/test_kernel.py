"""Fused Pallas kernel vs the XLA pipeline (interpreter mode on CPU).

With injected noise the kernel path must match the XLA path to float32
round-off on costs and the optimal sequence, for all three model families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import (
    diff_drive_launch,
    full_body_launch,
    steering_launch,
)
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.solver import mppi_step

T = 12
K = 4096  # multiple of K_TILE


def _setup(launch):
    cfg, sp, cp, course = launch(num_samples=K, horizon=T, dtype=np.float32)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    u_dim = {"unicycle": 2, "steering_unicycle": 3, "full_body": 5}[cfg.model]
    ctrl = ControllerState(
        u_prev=jnp.asarray(
            np.random.RandomState(1).randn(T - 1, u_dim) * 0.1, jnp.float32
        ),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    state = jnp.zeros(cfg.num_states, jnp.float32).at[1].set(float(course[0, 1]))
    noise = jnp.asarray(
        np.random.RandomState(2).randn(T - 1, K, u_dim), jnp.float32
    )
    return cfg, sp, cp, path, ctrl, state, noise


@pytest.mark.parametrize(
    "launch", [diff_drive_launch, steering_launch, full_body_launch]
)
def test_kernel_matches_xla_with_injected_noise(launch):
    cfg, sp, cp, path, ctrl, state, noise = _setup(launch)
    dt = jnp.float32(0.1)
    _, res_xla = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, res_krn = mppi_step(
        cfg, ctrl, state, path, dt, sp, cp, noise=noise,
        use_kernel=True, kernel_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(res_krn.u_opt), np.asarray(res_xla.u_opt), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        float(res_krn.stats["min_cost"]),
        float(res_xla.stats["min_cost"]),
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        float(res_krn.stats["ess"]), float(res_xla.stats["ess"]), rtol=1e-3
    )


def test_kernel_steer_off_zeroes_direction():
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    cfg = cfg.__class__(
        model=cfg.model, num_samples=K, horizon=T, steer_off=True
    )
    path = PathBuffer.from_points(course, 0.1)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), T, 5)
    state = jnp.zeros(5, jnp.float32)
    noise = jnp.asarray(np.random.RandomState(3).randn(T - 1, K, 5), jnp.float32)
    _, res = mppi_step(
        cfg, ctrl, state, path, jnp.float32(0.1), sp, cp, noise=noise,
        use_kernel=True, kernel_interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(res.u_opt[:, 2]), 0.0)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_seed has no CPU lowering; hardware-executed counterpart: scripts/tpu_smoke.py (committed run: artifacts/tpu_smoke.json)",
)
def test_kernel_rng_mode_statistics():
    """In-kernel Box-Muller stream: mean/std of the resulting update are sane
    and deterministic for a fixed key."""
    cfg, sp, cp, path, ctrl, state, _ = _setup(diff_drive_launch)
    dt = jnp.float32(0.1)
    _, res_a = mppi_step(
        cfg, ctrl, state, path, dt, sp, cp, use_kernel=True, kernel_interpret=True
    )
    _, res_b = mppi_step(
        cfg, ctrl, state, path, dt, sp, cp, use_kernel=True, kernel_interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.u_opt), np.asarray(res_b.u_opt)
    )
    assert np.isfinite(np.asarray(res_a.u_opt)).all()
    # update stays inside the control box
    assert float(jnp.max(res_a.u_opt[:, 0])) <= float(sp.u_max[0]) + 1e-6
    assert float(jnp.min(res_a.u_opt[:, 0])) >= float(sp.u_min[0]) - 1e-6


def test_kernel_rate_limited_matches_xla():
    from ccv_mppi_path_tracker_tpu.core.config import rate_limited_steering_config

    cfg, sp, cp = rate_limited_steering_config(
        num_samples=K, horizon=T, path_weight=10.0
    )
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch

    _, _, _, course = diff_drive_launch()
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), T, 3)
    state = jnp.zeros(4, jnp.float32).at[1].set(float(course[0, 1]))
    noise = jnp.asarray(np.random.RandomState(5).randn(T - 1, K, 3), jnp.float32)
    dt = jnp.float32(0.1)
    _, a = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, b = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                     use_kernel=True, kernel_interpret=True)
    # f32 rounding between the XLA reduction order and the kernel's online
    # accumulation grows with T; observed ~2e-5 max abs at T=60
    np.testing.assert_allclose(np.asarray(b.u_opt), np.asarray(a.u_opt),
                               rtol=5e-4, atol=5e-5)


def test_batched_kernel_matches_per_robot_loop():
    """Fleet (batched) kernel mode == per-robot single calls, injected noise."""
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import (
        fused_sample_rollout_cost,
        pack_scalars,
    )

    B, Kb, Tb = 3, 2048, 8
    cfg, sp, cp, course = diff_drive_launch(num_samples=Kb, horizon=Tb)
    rng = np.random.RandomState(0)
    u_prev = jnp.asarray(rng.randn(B, Tb - 1, 2) * 0.1, jnp.float32)
    ref = jnp.asarray(rng.randn(B, Tb, 2), jnp.float32)
    state0 = jnp.asarray(rng.randn(B, 3), jnp.float32)
    scal = jnp.stack([
        pack_scalars(jnp.float32(0.1), cp, float(b), lam=sp.lam)
        for b in range(B)
    ])
    seeds = jnp.arange(B, dtype=jnp.int32)
    noise = jnp.asarray(
        rng.randn(B, Tb - 1, 2, Kb // 128, 128), jnp.float32
    )

    cv, uv, sv = fused_sample_rollout_cost(
        u_prev, sp.control_noise, sp.u_min, sp.u_max, ref, state0, scal,
        seeds, num_samples=Kb, model="unicycle", noise=noise, interpret=True,
    )
    assert cv.shape == (B, Kb)
    for b in range(B):
        c, u, s = fused_sample_rollout_cost(
            u_prev[b], sp.control_noise, sp.u_min, sp.u_max, ref[b],
            state0[b], scal[b], seeds[b:b + 1], num_samples=Kb,
            model="unicycle", noise=noise[b], interpret=True,
        )
        np.testing.assert_allclose(np.asarray(cv[b]), np.asarray(c), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(uv[b]), np.asarray(u), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sv[b]), np.asarray(s), rtol=1e-6)


def test_kernel_matches_xla_at_tall_horizon_tile_switch():
    """T=60 drops the kernel tile height to 16 rows (VMEM budget) — parity
    must hold across the tile-height switch, not just at the T=12 default."""
    Tt = 60
    cfg, sp, cp, course = full_body_launch(
        num_samples=K, horizon=Tt, dtype=np.float32
    )
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import tile_rows

    assert tile_rows(Tt, 5, True, K) < tile_rows(T, 5, True, K)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    ctrl = ControllerState(
        u_prev=jnp.asarray(
            np.random.RandomState(1).randn(Tt - 1, 5) * 0.1, jnp.float32
        ),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    state = jnp.zeros(5, jnp.float32).at[1].set(float(course[0, 1]))
    noise = jnp.asarray(
        np.random.RandomState(2).randn(Tt - 1, K, 5), jnp.float32
    )
    dt = jnp.float32(0.1)
    _, a = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, b = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                     use_kernel=True, kernel_interpret=True)
    # f32 rounding between the XLA reduction order and the kernel's
    # online accumulation grows with T; observed ~2e-5 max abs at T=60
    np.testing.assert_allclose(np.asarray(b.u_opt), np.asarray(a.u_opt),
                               rtol=5e-4, atol=5e-5)


def test_kernel_elite_frac_matches_xla():
    """elite_frac on the kernel path (two-pass, threshold mask in the
    accumulator) == the XLA path's globally-rank-thresholded update."""
    cfg, sp, cp, path, ctrl, state, noise = _setup(full_body_launch)
    dt = jnp.float32(0.1)
    _, a = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                     elite_frac=0.1)
    _, b = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                     elite_frac=0.1, use_kernel=True, kernel_interpret=True)
    np.testing.assert_allclose(np.asarray(b.u_opt), np.asarray(a.u_opt),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        float(b.stats["elite_thresh"]), float(a.stats["elite_thresh"]),
        rtol=1e-6,
    )


def test_kernel_masked_tail_matches_xla_at_reference_k():
    """ANY K is accepted: the reference's own full_body default K=10000
    (src/full_body_mppi.cpp:10, not a multiple of 128) pads to whole tiles
    with the tail exactly zero-weighted — the update and costs must match
    the XLA pipeline at the true K under injected noise."""
    Km = 10000
    cfg, sp, cp, course = full_body_launch(
        num_samples=Km, horizon=T, dtype=np.float32
    )
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import (
        padded_k,
        tile_rows,
    )

    rows = tile_rows(T, 5, True, Km)
    assert padded_k(Km, rows) > Km  # genuinely exercises the mask
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    ctrl = ControllerState(
        u_prev=jnp.asarray(
            np.random.RandomState(1).randn(T - 1, 5) * 0.1, jnp.float32
        ),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    state = jnp.zeros(5, jnp.float32).at[1].set(float(course[0, 1]))
    noise = jnp.asarray(
        np.random.RandomState(2).randn(T - 1, Km, 5), jnp.float32
    )
    dt = jnp.float32(0.1)
    _, a = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise)
    _, b = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                     use_kernel=True, kernel_interpret=True)
    assert b.stats is not None
    np.testing.assert_allclose(np.asarray(b.u_opt), np.asarray(a.u_opt),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        float(b.stats["min_cost"]), float(a.stats["min_cost"]), rtol=2e-5
    )
    # elite_frac's two-pass flow must honor the same mask
    _, ae = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                      elite_frac=0.1)
    _, be = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                      elite_frac=0.1, use_kernel=True, kernel_interpret=True)
    np.testing.assert_allclose(np.asarray(be.u_opt), np.asarray(ae.u_opt),
                               rtol=2e-4, atol=2e-5)


def test_kernel_variant_arms_match_default():
    """The A/B kernel-structure switches (former module globals, now the
    explicit KernelVariant argument threaded through mppi_step) must agree
    with the production default: same-op-order arms bit-exactly, the
    re-associated difference distance form to float32 round-off."""
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import KernelVariant

    cfg, sp, cp, path, ctrl, state, noise = _setup(full_body_launch)
    dt = jnp.float32(0.1)
    _, base = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                        use_kernel=True, kernel_interpret=True)
    arms = [
        (KernelVariant(dist_form="difference"), False),
        (KernelVariant(mindist_unroll="full"), True),
        (KernelVariant(tloop="unroll"), True),
        (KernelVariant(tloop="block4"), True),
        (KernelVariant(tloop="half2"), True),
        (KernelVariant(tloop="carry5"), True),
        (KernelVariant(tloop="rowload"), True),
    ]
    for kv, exact in arms:
        _, res = mppi_step(cfg, ctrl, state, path, dt, sp, cp, noise=noise,
                           use_kernel=True, kernel_interpret=True,
                           kernel_variant=kv)
        if exact:
            np.testing.assert_array_equal(
                np.asarray(res.u_opt), np.asarray(base.u_opt), err_msg=str(kv)
            )
        else:
            np.testing.assert_allclose(
                np.asarray(res.u_opt), np.asarray(base.u_opt),
                rtol=2e-5, atol=2e-6, err_msg=str(kv),
            )


def test_kernel_group_ablation_arms():
    """Floor-accounting arms (scripts/kernel_floor.py): each progressive
    group subset runs; cost-free arms return exactly zero costs (the probe
    scalar is 0 at runtime), the +dist arm reproduces the full production
    costs bit-exactly, and a zero path_weight reproduces the +zmp arm."""
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import (
        KernelVariant,
        fused_sample_rollout_cost,
        pack_scalars,
        padded_k,
        tile_noise,
        tile_rows,
    )

    Ks, Ts = 1024, 8
    cfg, sp, cp, course = full_body_launch(num_samples=Ks, horizon=Ts,
                                           dtype=np.float32)
    from ccv_mppi_path_tracker_tpu.models import get_model

    mp = get_model("full_body").default_params
    rng = np.random.RandomState(7)
    u_prev = jnp.asarray(rng.randn(Ts - 1, 5) * 0.1, jnp.float32)
    state = jnp.zeros(5, jnp.float32).at[1].set(float(course[0, 1]))
    ref = jnp.asarray(course[:Ts, :2], jnp.float32)
    scal = pack_scalars(jnp.float32(0.1), cp, 0.0, mp, lam=float(sp.lam))
    rows = tile_rows(Ts, 5, True, Ks)
    noise = tile_noise(
        jnp.asarray(rng.randn(Ts - 1, Ks, 5), jnp.float32),
        padded_k(Ks, rows),
    )
    seed = jnp.zeros(1, jnp.int32)

    def run(groups, accumulate, scal=scal):
        kv = KernelVariant(groups=frozenset(groups))
        return fused_sample_rollout_cost(
            u_prev, sp.control_noise, sp.u_min, sp.u_max, ref, state, scal,
            seed, num_samples=Ks, model="full_body", noise=noise,
            interpret=True, accumulate=accumulate, variant=kv,
        )

    full_costs, full_u, full_s = run(
        ("sample", "loop", "euler", "zmp", "dist"), True
    )[:3]
    assert float(jnp.sum(full_s)) > 0.0

    for groups in (("sample",), ("sample", "loop"),
                   ("sample", "loop", "euler")):
        costs, u_rows, s_row = run(groups, False)[:3]
        np.testing.assert_array_equal(np.asarray(costs), 0.0, err_msg=str(groups))
        np.testing.assert_array_equal(np.asarray(u_rows), 0.0)

    # +dist == production costs bit-exactly (acc skipped)
    costs_d = run(("sample", "loop", "euler", "zmp", "dist"), False)[0]
    np.testing.assert_array_equal(np.asarray(costs_d), np.asarray(full_costs))

    # +zmp == production with the path term weighted to zero
    import dataclasses

    cp0 = dataclasses.replace(cp, path_weight=jnp.float32(0.0))
    scal0 = pack_scalars(jnp.float32(0.1), cp0, 0.0, mp, lam=float(sp.lam))
    costs_z = run(("sample", "loop", "euler", "zmp"), False)[0]
    costs_p0 = run(("sample", "loop", "euler", "zmp", "dist"), False,
                   scal=scal0)[0]
    np.testing.assert_array_equal(np.asarray(costs_z), np.asarray(costs_p0))

    # ablated groups are a full_body-only instrument
    with pytest.raises(AssertionError):
        fused_sample_rollout_cost(
            u_prev[:, :2], sp.control_noise[:2], sp.u_min[:2], sp.u_max[:2],
            ref, state[:3], scal, seed, num_samples=Ks, model="unicycle",
            noise=None, interpret=True,
            variant=KernelVariant(groups=frozenset({"sample"})),
        )
