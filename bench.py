#!/usr/bin/env python
"""Headline benchmark: full-body MPPI control step at K=100k, T=30.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: state-propagations/s through the COMPLETE control update (sampling +
rollout + ZMP + cost + softmax + weighted update), K*(T-1) propagations per
step. Baseline: the reference C++ full-body node's implied ceiling of
K*(T-1)*rate = 10000*14*10 = 1.4e6 propagations/s (serial CPU loop at its
10 Hz deadline, BASELINE.md) — the number its hardware had to hit for the
robot to function.

Extra fields report control-update latency (ms, blocking per call) and the
equivalent replanning rate at the benched K — the reference replans at 10 Hz.
"""

import argparse
import json
import os
import statistics
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="full_body",
                   choices=["unicycle", "steering_unicycle", "full_body"])
    p.add_argument("--num-samples", type=int, default=100_000)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import (
        diff_drive_launch, full_body_launch, steering_launch,
    )
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step
    import functools

    launch = {
        "unicycle": diff_drive_launch,
        "steering_unicycle": steering_launch,
        "full_body": full_body_launch,
    }[args.model]
    cfg, sp, cp, course = launch(num_samples=args.num_samples, horizon=args.horizon)
    model = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), cfg.horizon,
                                   model.num_controls)
    state = jnp.zeros(model.num_states, jnp.float32).at[1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)

    step = jax.jit(functools.partial(mppi_step, cfg), donate_argnums=(0,))

    # warmup / compile
    t0 = time.time()
    ctrl, res = step(ctrl, state, path, dt, sp, cp)
    jax.block_until_ready(res.u0)
    compile_s = time.time() - t0

    # blocking per-call latency (true control-update latency incl. dispatch)
    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        ctrl, res = step(ctrl, state, path, dt, sp, cp)
        jax.block_until_ready(res.u0)
        lat.append(time.perf_counter() - t0)
    lat_ms = statistics.median(lat) * 1e3

    # pipelined throughput (amortized dispatch — the closed-loop regime)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ctrl, res = step(ctrl, state, path, dt, sp, cp)
    jax.block_until_ready(res.u0)
    thru_s = (time.perf_counter() - t0) / args.iters

    props_per_step = args.num_samples * (args.horizon - 1)
    value = props_per_step / thru_s
    baseline = 10_000 * 14 * 10  # reference full-body implied ceiling, BASELINE.md
    out = {
        "metric": "mppi_full_control_update_state_propagations_per_s",
        "value": round(value, 1),
        "unit": "propagations/s",
        "vs_baseline": round(value / baseline, 2),
        "model": cfg.model,
        "num_samples": args.num_samples,
        "horizon": args.horizon,
        "latency_ms": round(lat_ms, 3),
        "replan_hz_pipelined": round(1.0 / thru_s, 1),
        "replan_hz_blocking": round(1e3 / lat_ms, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
