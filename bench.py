#!/usr/bin/env python
"""Headline benchmark: full-body MPPI control update throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload: the COMPLETE control update (sampling + rollout + ZMP + cost +
softmax + weighted update) on the flagship full-body model, K=102400 samples,
T=30 horizon, via the fused Pallas kernel path. Metric: K*(T-1) state
propagations per second. Baseline: the reference C++ full-body node's implied
ceiling of K*(T-1)*rate = 10000*14*10 = 1.4e6 propagations/s (serial CPU loop
meeting its 10 Hz deadline; BASELINE.md).

Timing methodology: this environment tunnels the TPU through a relay whose
``block_until_ready`` acknowledges enqueue rather than completion, so naive
wall-clock timing inflates absurdly. We therefore time a *chained* sequence
of control updates (each consumes the previous ControllerState) terminated
by a scalar fetch (forces real execution), at two chain lengths, and report
the MARGINAL time per step — fixed relay round-trip cancels out.
"""

import argparse
import functools
import json
import os
import time


def _chain_time(f, make_ctrl, args, fetch, iters):
    ctrl = make_ctrl()
    t0 = time.perf_counter()
    for _ in range(iters):
        ctrl, res = f(ctrl, *args)
    fetch(res)
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="full_body",
                   choices=["unicycle", "steering_unicycle",
                            "rate_limited_steering", "full_body"])
    p.add_argument("--num-samples", type=int, default=102_400)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", type=int, default=72)
    p.add_argument("--reps", type=int, default=10,
                   help="repetitions per chain length; min is used (relay "
                        "round-trip jitter and transient service load are "
                        "additive noise; observed up to ~10x inflation under "
                        "sustained load)")
    p.add_argument("--no-kernel", action="store_true",
                   help="use the XLA pipeline instead of the Pallas kernel")
    p.add_argument("--lean", dest="lean", action="store_true", default=True,
                   help="serving mode (DEFAULT, as in runtime/realtime.py): "
                        "StepResult carries only u_opt/u0 — identical "
                        "solver math, no diagnostic output buffers")
    p.add_argument("--full", dest="lean", action="store_false",
                   help="carry the full diagnostic StepResult (ref window, "
                        "planned path, cost stats; ~0.1-0.15 ms/step of "
                        "extra output allocation through this relay)")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import (
        diff_drive_launch, full_body_launch, rate_limited_launch,
        steering_launch,
    )
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    launch = {
        "unicycle": diff_drive_launch,
        "steering_unicycle": steering_launch,
        "rate_limited_steering": rate_limited_launch,
        "full_body": full_body_launch,
    }[args.model]
    use_kernel = not args.no_kernel
    cfg, sp, cp, course = launch(num_samples=args.num_samples, horizon=args.horizon)
    model = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(model.num_states, jnp.float32).at[1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)

    step = jax.jit(
        functools.partial(mppi_step, cfg, use_kernel=use_kernel,
                          lean=args.lean),
        donate_argnums=(0,),
    )
    g = jax.jit(lambda x: jnp.sum(x))
    fetch = lambda res: float(g(res.u0))
    make_ctrl = lambda: ControllerState.initial(
        jax.random.PRNGKey(0), cfg.horizon, model.num_controls
    )
    step_args = (state, path, dt, sp, cp)

    # compile_s = trace + (remote) compile + cache load, measured AOT so a
    # relay stall on the first EXECUTION can't pollute it (warm runs were
    # reporting 100 s+ "compile" that was really a wedged first fetch).
    t0 = time.time()
    compiled = step.lower(make_ctrl(), *step_args).compile()
    compile_s = time.time() - t0
    del compiled
    ctrl, res = step(make_ctrl(), *step_args)  # warm the execution path
    fetch(res)

    t_short = min(
        _chain_time(step, make_ctrl, step_args, fetch, args.short)
        for _ in range(args.reps)
    )
    t_long = min(
        _chain_time(step, make_ctrl, step_args, fetch, args.long)
        for _ in range(args.reps)
    )
    per_step = (t_long - t_short) / (args.long - args.short)

    props = args.num_samples * (args.horizon - 1)
    value = props / per_step
    baseline = 10_000 * 14 * 10  # reference full-body ceiling, BASELINE.md
    out = {
        "metric": "mppi_full_control_update_state_propagations_per_s",
        "value": round(value, 1),
        "unit": "propagations/s",
        "vs_baseline": round(value / baseline, 2),
        "model": cfg.model,
        "num_samples": args.num_samples,
        "horizon": args.horizon,
        "kernel": use_kernel,
        "lean": args.lean,
        "step_ms": round(per_step * 1e3, 3),
        "replan_hz": round(1.0 / per_step, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
