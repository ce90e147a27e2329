#!/usr/bin/env python
"""Ablation breakdown of the flagship kernel-path control step on TPU.

VERDICT r1 weak#1: ~40% of the 1.24 ms K=102400 full-body step was
unaccounted fixed overhead. This script times (chained-marginal, same
methodology as bench.py) a ladder of step variants, each chained through its
own output so the device must execute serially:

  full        complete mppi_step (kernel path) — the headline workload
  no_reroll   minus the optimal-sequence re-roll (opt_states scan)
  no_resample minus resample_reference (reference window precomputed)
  kernel_only just the fused kernel + the finishing partial-sum reduction
  floor       a trivial chained add — the per-step dispatch/relay floor

The deltas between rungs attribute the non-kernel time. Writes
artifacts/profile_step.json.

    python scripts/profile_step.py --num-samples 102400 --horizon 30
"""

import argparse
import functools
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


def chain_time(step, make_init, iters, fetch):
    # make_init: FACTORY — the step donates its carry, so every chain needs
    # a fresh buffer (reusing one raises InvalidArgument on the donated arg)
    c = make_init()
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    fetch(c)
    return time.perf_counter() - t0


def marginal_ms(step, make_init, fetch, short=8, long=72, reps=6):
    ts = min(chain_time(step, make_init, short, fetch) for _ in range(reps))
    tl = min(chain_time(step, make_init, long, fetch) for _ in range(reps))
    return (tl - ts) / (long - short) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=102_400)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--out", default="artifacts/profile_step.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.core.random import next_cycle_key
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.ops.softmax_update import softmax_weights
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
    from ccv_mppi_path_tracker_tpu.solver import mppi_step
    from ccv_mppi_path_tracker_tpu.solver.mppi import _kernel_sample_rollout_cost

    K, T = args.num_samples, args.horizon
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    model = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(5, jnp.float32).at[1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)
    mk = lambda: ControllerState.initial(jax.random.PRNGKey(0), T, 5)
    g = jax.jit(lambda x: jnp.sum(x))

    results = {}

    def timeit(name, step, make_init, fetch):
        # warm/compile
        c = step(make_init())
        fetch(c)
        ms = marginal_ms(step, make_init, fetch, reps=args.reps)
        results[name] = round(ms, 3)
        print(f"{name:12s} {ms:7.3f} ms", flush=True)

    # --- full step ----------------------------------------------------------
    full = jax.jit(functools.partial(mppi_step, cfg, use_kernel=True),
                   donate_argnums=(0,))
    timeit(
        "full",
        lambda c: full(c, state, path, dt, sp, cp)[0],
        mk,
        lambda c: float(g(c.u_prev)),
    )

    # no_reroll: key chain + resample + kernel + softmax stats + finish,
    # WITHOUT the optimal-sequence re-roll
    def core(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        ref = resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref, dt, sp, cp, model.default_params,
            use_key, None, cfg.num_samples, False,
        )
        _, stats = softmax_weights(costs, sp.lam)
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        u_opt = (u_num / jnp.sum(s_row)) + 0.0 * stats["min_cost"]
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("no_reroll", jax.jit(core, donate_argnums=(0,)), mk,
           lambda c: float(g(c.u_prev)))

    # no_resample additionally drops the reference-window resample; the ref
    # must then come in as a constant-folded input — close over a concrete one
    ref_const = jax.jit(
        lambda: resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
    )()

    def core_noresample(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref_const, dt, sp, cp,
            model.default_params, use_key, None, cfg.num_samples, False,
        )
        _, stats = softmax_weights(costs, sp.lam)
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        # keep the stats live (XLA would DCE an unused softmax pass)
        u_opt = (u_num / jnp.sum(s_row)) + 0.0 * stats["min_cost"]
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("no_resample", jax.jit(core_noresample, donate_argnums=(0,)),
           mk, lambda c: float(g(c.u_prev)))

    # kernel_only: fused kernel + finishing sums, no softmax stats either
    def kernel_only(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref_const, dt, sp, cp,
            model.default_params, use_key, None, cfg.num_samples, False,
        )
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        u_opt = u_num / jnp.sum(s_row)
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("kernel_only", jax.jit(kernel_only, donate_argnums=(0,)),
           mk, lambda c: float(g(c.u_prev)))

    # floor: trivial chained program — measures dispatch + chain latency
    floor = jax.jit(
        lambda c: ControllerState(
            u_prev=c.u_prev + 1e-7, key=c.key, step=c.step + 1
        ),
        donate_argnums=(0,),
    )
    timeit("floor", floor, mk, lambda c: float(g(c.u_prev)))

    out = {
        "num_samples": K,
        "horizon": T,
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ms": results,
        "attribution_ms": {
            "reroll": round(results["full"] - results["no_reroll"], 3),
            "resample": round(results["no_reroll"] - results["no_resample"], 3),
            "softmax_stats": round(
                results["no_resample"] - results["kernel_only"], 3
            ),
            "kernel_compute": round(
                results["kernel_only"] - results["floor"], 3
            ),
            "dispatch_floor": results["floor"],
        },
    }
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
