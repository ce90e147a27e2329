#!/usr/bin/env python
"""Stage-level breakdown of the XLA (non-kernel) pipeline at the flagship
config — the path every user-registered model runs on.

Times each stage as its own jitted program (chained-marginal method):
sampling, rollout (cumsum closed form AND a triangular-matmul variant),
ZMP chain, trajectory cost, softmax + weighted update — plus the whole
fused step for comparison (stage sums exceed the whole where XLA fuses
across stage boundaries). Writes artifacts/xla_breakdown.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=102_400)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", type=int, default=40)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.core.types import RefWindow
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.models.full_body import zmp_chain
    from ccv_mppi_path_tracker_tpu.ops.costs import full_body_cost
    from ccv_mppi_path_tracker_tpu.ops.rollout import rollout_closed_form
    from ccv_mppi_path_tracker_tpu.ops.sampling import sample_controls
    from ccv_mppi_path_tracker_tpu.ops.softmax_update import (
        softmax_weights,
        weighted_update,
    )

    K, T = args.num_samples, args.horizon
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    model = get_model("full_body")
    mp = model.default_params
    rng = np.random.RandomState(0)
    u_prev = jnp.asarray(rng.randn(T - 1, 5) * 0.05, jnp.float32)
    state0 = jnp.zeros(5, jnp.float32)
    ref = RefWindow(
        xy=jnp.asarray(course[:T, :2], jnp.float32),
        yaw=jnp.zeros(T, jnp.float32),
    )
    dt = jnp.float32(0.1)
    key = jax.random.PRNGKey(0)

    # ----- stage programs, each chained through a data dependency ---------
    @jax.jit
    def f_sample(key):
        u = sample_controls(key, u_prev, sp, K)
        return jax.random.fold_in(key, 0), u

    @jax.jit
    def f_rollout(u):
        s0 = jnp.broadcast_to(state0, (K, 5))
        return rollout_closed_form("full_body", s0, u, dt)

    def cumsum_mm(rate, dt):
        tm1 = rate.shape[0]
        tri = jnp.tril(jnp.ones((tm1, tm1), rate.dtype))
        run = jnp.einsum("st,tk...->sk...", tri, rate,
                         precision=jax.lax.Precision.HIGHEST) * dt
        return jnp.concatenate([jnp.zeros_like(run[:1]), run], axis=0)

    @jax.jit
    def f_rollout_mm(u):
        v, w = u[..., 0], u[..., 1]
        yaw = state0[2] + cumsum_mm(w, dt)
        heading = yaw[:-1] + u[..., 2]
        x = state0[0] + cumsum_mm(v * jnp.cos(heading), dt)
        y = state0[1] + cumsum_mm(v * jnp.sin(heading), dt)
        roll = state0[3] + cumsum_mm(u[..., 3], dt)
        pitch = state0[4] + cumsum_mm(u[..., 4], dt)
        return jnp.stack([x, y, yaw, roll, pitch], axis=-1)

    @jax.jit
    def f_zmp(states, u):
        return zmp_chain(states, u, dt, mp)

    @jax.jit
    def f_cost(states, u, zmp):
        return full_body_cost(states, u, zmp, ref, cp)

    @jax.jit
    def f_update(costs, u):
        wts, stats = softmax_weights(costs, sp.lam)
        return weighted_update(wts, u), stats

    # materialized stage inputs
    _, u = f_sample(key)
    states = f_rollout(u)
    zmp = f_zmp(states, u)
    costs = f_cost(states, u, zmp)
    u_opt, _ = f_update(costs, u)
    jax.block_until_ready(u_opt)

    def timed(name, fn, fetch, *fargs):
        def chain(iters):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = fn(*fargs)
            fetch(o)
            return time.perf_counter() - t0

        chain(1)  # warm
        ts = min(chain(args.short) for _ in range(args.reps))
        tl = min(chain(args.long) for _ in range(args.reps))
        ms = (tl - ts) / (args.long - args.short) * 1e3
        print(f"{name}: {ms:.3f} ms", flush=True)
        return round(ms, 3)

    results = {}
    results["sample"] = timed(
        "sample", f_sample, lambda o: float(o[1][0, 0, 0]), key)
    results["rollout_cumsum"] = timed(
        "rollout_cumsum", f_rollout, lambda o: float(o[0, 0, 0]), u)
    results["rollout_trimatmul"] = timed(
        "rollout_trimatmul", f_rollout_mm, lambda o: float(o[0, 0, 0]), u)
    # matmul-form accuracy vs cumsum form
    d = float(jnp.max(jnp.abs(f_rollout_mm(u) - states)))
    results["trimatmul_maxdiff"] = d
    results["zmp"] = timed("zmp", f_zmp, lambda o: float(o[0, 0, 0]),
                           states, u)
    results["cost"] = timed("cost", f_cost, lambda o: float(o[0]),
                            states, u, zmp)
    results["softmax_update"] = timed(
        "softmax_update", f_update, lambda o: float(o[0][0, 0]), costs, u)
    print("trimatmul maxdiff vs cumsum:", d, flush=True)

    out = {"num_samples": K, "horizon": T,
           "method": "per-stage jits, chained-marginal, min over reps",
           "results": results}
    path_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "xla_breakdown.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
