"""Property-based parity fuzz: randomized configurations vs the NumPy oracle.

The fixed-shape parity suite (tests/test_solver_parity.py) pins one (K, T,
weights) point per model. This fuzz sweeps randomized horizons, sample
counts, cost weights, control bounds, start states, and noise scales —
checking that the solver's u_opt tracks the float64 oracle at every draw.
Seeds are fixed, so failures reproduce exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_mppi_path_tracker_tpu.core.config import (
    CostParams,
    SolverConfig,
    make_cost_params,
    make_solver_params,
)
from ccv_mppi_path_tracker_tpu.core.types import ControllerState
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.oracle import oracle_step
from ccv_mppi_path_tracker_tpu.paths import PathBuffer, sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.solver import mppi_step

MODELS = {
    "unicycle": (2, 3),
    "steering_unicycle": (3, 3),
    "rate_limited_steering": (3, 4),
    "full_body": (5, 5),
}


@pytest.mark.parametrize("trial", range(8))
def test_randomized_config_matches_oracle(trial):
    rng = np.random.RandomState(1000 + trial)
    model_name = list(MODELS)[trial % len(MODELS)]
    u_dim, s_dim = MODELS[model_name]

    T = int(rng.randint(4, 25))
    K = int(rng.randint(8, 96))
    dt = float(rng.uniform(0.05, 0.2))
    control_noise = float(rng.uniform(0.2, 1.5))
    lam = float(rng.uniform(0.3, 3.0))
    v_ref = float(rng.uniform(0.3, 2.0))
    path_w = float(rng.uniform(0.5, 20.0))
    v_w = float(rng.uniform(0.1, 5.0))
    # full-body extra weights randomized too (make_cost_params defaults them
    # to 0 while the oracle defaults to 1 — always pass both explicitly)
    fb_w = {k: float(rng.uniform(0.1, 5.0))
            for k in ("zmp_weight", "roll_v_weight", "back_weight",
                      "yaw_weight")}
    lo = -rng.uniform(0.5, 3.0, u_dim)
    hi = rng.uniform(0.5, 3.0, u_dim)

    course = sum_of_cosines_course(
        amplitudes=(rng.uniform(0.5, 1.5), rng.uniform(0, 0.5), 0.0),
        frequencies=(rng.uniform(0.1, 0.4), rng.uniform(0.3, 0.7), 0.0),
        resolution=0.1,
        course_length=10.0,
    )
    state = rng.randn(s_dim) * 0.3
    if model_name == "rate_limited_steering":
        state[3] = np.clip(state[3], -0.4, 0.4)
    noise = rng.randn(T - 1, K, u_dim)
    u_prev = rng.randn(T - 1, u_dim) * 0.2

    cfg = SolverConfig(model=model_name, num_samples=K, horizon=T)
    sp = make_solver_params(control_noise, lam, lo, hi, dtype=np.float64)
    cp = make_cost_params(
        v_ref=v_ref, path_weight=path_w, v_weight=v_w, dtype=np.float64,
        **fb_w,
    )
    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    ctrl = ControllerState(
        u_prev=jnp.asarray(u_prev),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    kw = {}
    if model_name == "full_body":
        p = get_model("full_body").default_params
        kw = dict(
            mass=float(p.mass), base2com=float(p.base2com),
            inertia=np.asarray(p.inertia), gravity_z=float(p.gravity_z),
        )

    _, res = jax.jit(
        lambda c, s, n: mppi_step(
            cfg, c, s, path, jnp.float64(dt), sp, cp, noise=n
        )
    )(ctrl, jnp.asarray(state), jnp.asarray(noise))
    ora = oracle_step(
        model_name, u_prev, state, course, 0.1, dt, noise,
        control_noise=control_noise, lam=lam, u_min=lo, u_max=hi,
        v_ref=v_ref, path_weight=path_w, v_weight=v_w, **fb_w, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(res.u_opt), ora["u_opt"], rtol=1e-8, atol=1e-11,
        err_msg=f"{model_name} T={T} K={K} dt={dt:.3f}",
    )
    np.testing.assert_allclose(
        float(res.stats["min_cost"]), ora["costs"].min(), rtol=1e-8,
    )
