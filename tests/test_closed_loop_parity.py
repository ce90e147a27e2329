"""Multi-cycle closed-loop lockstep parity: JAX solver vs the C++ oracle.

The BASELINE north star requires the optimal controls to be allclose to the
C++ reference semantics. Here both implementations run a full receding-
horizon tracking session side by side — identical injected noise each cycle,
each integrating its own plant with its own u[0] — and the trajectories must
stay identical to float64 tolerance for the whole session. Any divergence in
sampling, reference resampling, rollout, cost, softmax, or update semantics
would compound and fail this within a few cycles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.config import (
    diff_drive_config,
    full_body_config,
)
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.models.full_body import default_params
from ccv_mppi_path_tracker_tpu.oracle.numpy_oracle import _rollout_sample
from ccv_mppi_path_tracker_tpu.paths import PathBuffer, sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.runtime.native import native_oracle_step
from ccv_mppi_path_tracker_tpu.solver import mppi_step

T = 10
K = 48
DT = 0.1
CYCLES = 20


@pytest.mark.parametrize("model_name", ["unicycle", "steering_unicycle", "full_body"])
def test_closed_loop_lockstep_parity(model_name):
    course = sum_of_cosines_course(
        amplitudes=(1.0, 0, 0), frequencies=(0.25, 0, 0), deltas=(0, 0, 0),
        course_length=10.0,
    )
    if model_name == "unicycle":
        cfg, sp, cp, = diff_drive_config(
            num_samples=K, horizon=T, path_weight=10.0, dtype=np.float64
        )
        u_dim, s_dim = 2, 3
        mp = None
    elif model_name == "steering_unicycle":
        from ccv_mppi_path_tracker_tpu.core.config import steering_diff_drive_config

        cfg, sp, cp = steering_diff_drive_config(
            num_samples=K, horizon=T, path_weight=10.0, dtype=np.float64
        )
        u_dim, s_dim = 3, 3
        mp = None
    else:
        cfg, sp, cp = full_body_config(
            num_samples=K, horizon=T, path_weight=10.0, dtype=np.float64
        )
        u_dim, s_dim = 5, 5
        mp = default_params(np.float64)

    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    plant = get_model(model_name)
    rng = np.random.RandomState(11)

    jax_state = jnp.zeros(s_dim, jnp.float64).at[1].set(course[0, 1])
    cpp_state = np.asarray(jax_state)
    ctrl = ControllerState(
        u_prev=jnp.zeros((T - 1, u_dim), jnp.float64),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )
    cpp_uprev = np.zeros((T - 1, u_dim))

    step = jax.jit(
        lambda c, s, n: mppi_step(cfg, c, s, path, DT, sp, cp,
                                  model_params=mp, noise=n)
    )

    for cycle in range(CYCLES):
        noise = rng.randn(T - 1, K, u_dim)
        ctrl, res = step(ctrl, jax_state, jnp.asarray(noise))
        cc = native_oracle_step(
            model_name, cpp_uprev, cpp_state, course, 0.1, DT, noise,
            control_noise=0.5, lam=1.0,
            u_min=np.asarray(sp.u_min), u_max=np.asarray(sp.u_max),
            v_ref=float(cp.v_ref), cp=cp, model_params=mp,
        )
        np.testing.assert_allclose(
            np.asarray(res.u_opt), cc["u_opt"], rtol=1e-9, atol=1e-12,
            err_msg=f"cycle {cycle}",
        )
        cpp_uprev = cc["u_opt"]
        # each side integrates its own plant with its own command
        jax_state = plant.step(jax_state, res.u0, DT)
        cpp_state = _rollout_sample(
            model_name, cpp_state, cc["u_opt"][:1], DT
        )[1]
        np.testing.assert_allclose(
            np.asarray(jax_state), cpp_state, rtol=1e-9, atol=1e-12,
            err_msg=f"cycle {cycle} state",
        )
