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

Self-calibration: service load on the shared relay varies 1.2-2x across
measurement windows (BENCH_DETAIL.md), so a single number is not comparable
across rounds. Each invocation therefore times THREE configurations
interleaved in the SAME window — kernel+lean (headline), kernel+full
diagnostics, and the XLA pipeline — and emits all three: cross-round readers
should compare ratios (which are load-invariant) or same-window deltas, not
bare milliseconds.
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
                   help="headline the XLA pipeline instead of the Pallas "
                        "kernel")
    p.add_argument("--no-triplet", action="store_true",
                   help="time only the headline configuration (skip the "
                        "same-window kernel-full / xla calibration arms)")
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

    g = jax.jit(lambda x: jnp.sum(x))
    fetch = lambda res: float(g(res.u0))
    make_ctrl = lambda: ControllerState.initial(
        jax.random.PRNGKey(0), cfg.horizon, model.num_controls
    )
    step_args = (state, path, dt, sp, cp)

    # headline name carries BOTH axes (--no-kernel --full => "xla_full",
    # compiled as its own fourth variant) so the timed configuration always
    # matches the reported "lean" flag (ADVICE r4)
    headline = (f"{'xla' if args.no_kernel else 'kernel'}"
                f"_{'lean' if args.lean else 'full'}")
    variants = {headline: None}
    if not args.no_triplet:
        for name in ("kernel_lean", "kernel_full", "xla_lean"):
            variants.setdefault(name, None)
    for name in variants:
        uk, lean = name.startswith("kernel"), name.endswith("lean")
        variants[name] = jax.jit(
            functools.partial(mppi_step, cfg, use_kernel=uk, lean=lean),
            donate_argnums=(0,),
        )

    # compile_s = trace + (remote) compile + cache load, measured AOT so a
    # relay stall on the first EXECUTION can't pollute it (warm runs were
    # reporting 100 s+ "compile" that was really a wedged first fetch).
    # Only the headline's compile is reported; the calibration arms are
    # compiled/warmed before any timing so they never pollute the window.
    compile_s = None
    for name, step in variants.items():
        t0 = time.time()
        compiled = step.lower(make_ctrl(), *step_args).compile()
        if name == headline:
            compile_s = time.time() - t0
        del compiled
        ctrl, res = step(make_ctrl(), *step_args)  # warm the execution path
        fetch(res)

    # interleave all variants inside every repetition so they share each
    # measurement window's service load; min over reps per variant
    t_short = {name: [] for name in variants}
    t_long = {name: [] for name in variants}
    for _ in range(args.reps):
        for name, step in variants.items():
            t_short[name].append(
                _chain_time(step, make_ctrl, step_args, fetch, args.short)
            )
        for name, step in variants.items():
            t_long[name].append(
                _chain_time(step, make_ctrl, step_args, fetch, args.long)
            )
    per_step_by = {
        name: (min(t_long[name]) - min(t_short[name]))
        / (args.long - args.short)
        for name in variants
    }
    per_step = per_step_by[headline]

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
    if not args.no_triplet:
        ms = {n: round(v * 1e3, 3) for n, v in per_step_by.items()}
        out["window"] = {
            **{f"{n}_ms": v for n, v in ms.items()},
            "full_minus_lean_ms": round(
                ms["kernel_full"] - ms["kernel_lean"], 3
            ),
            "kernel_speedup_vs_xla": round(
                per_step_by["xla_lean"] / per_step_by["kernel_lean"], 2
            ),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
