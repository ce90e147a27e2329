#!/usr/bin/env python
"""Detailed benchmark suite -> BENCH_DETAIL.md.

Covers the BASELINE.json config matrix: all three models, K sweep, XLA vs
fused-kernel execution, T in {15, 30, 100}, plus the measured serial C++
baseline. Chained-marginal timing (see bench.py docstring for why).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import (
    diff_drive_launch, full_body_launch, rate_limited_launch,
    steering_launch,
)
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.solver import mppi_step

LAUNCH = {"unicycle": diff_drive_launch, "steering_unicycle": steering_launch,
          "rate_limited_steering": rate_limited_launch,
          "full_body": full_body_launch}
g = jax.jit(lambda x: jnp.sum(x))


def measure(model, K, T, use_kernel, short=8, long=72, reps=3):
    cfg, sp, cp, course = LAUNCH[model](num_samples=K, horizon=T)
    m = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(m.num_states, jnp.float32).at[1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)
    f = jax.jit(functools.partial(mppi_step, cfg, use_kernel=use_kernel),
                donate_argnums=(0,))
    mk = lambda: ControllerState.initial(jax.random.PRNGKey(0), T, m.num_controls)
    ctrl, res = f(mk(), state, path, dt, sp, cp); float(g(res.u0))

    def chain(iters):
        c = mk()
        t0 = time.perf_counter()
        for _ in range(iters):
            c, r = f(c, state, path, dt, sp, cp)
        float(g(r.u0))
        return time.perf_counter() - t0

    # min over reps: relay round-trip jitter is additive noise (bench.py)
    per = -1.0
    for _ in range(3):  # re-measure if jitter swamps the marginal
        t_short = min(chain(short) for _ in range(reps))
        t_long = min(chain(long) for _ in range(reps))
        per = (t_long - t_short) / (long - short)
        if per > 0:
            break
    return per


def measure_fleet(B, K, T, use_kernel, short=8, long=72, reps=3):
    from ccv_mppi_path_tracker_tpu.solver.batch import (
        build_fleet_step,
        init_fleet,
    )

    cfg, sp, cp, course = diff_drive_launch(num_samples=K, horizon=T)
    path = PathBuffer.from_points(course, 0.1)
    states = jnp.zeros((B, 3), jnp.float32).at[:, 1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)
    step = build_fleet_step(cfg, use_kernel=use_kernel)
    c, r = step(init_fleet(cfg, B), states, path, dt, sp, cp); float(g(r.u0))

    def chain(iters):
        c = init_fleet(cfg, B)
        t0 = time.perf_counter()
        for _ in range(iters):
            c, r = step(c, states, path, dt, sp, cp)
        float(g(r.u0))
        return time.perf_counter() - t0

    t_short = min(chain(short) for _ in range(reps))
    t_long = min(chain(long) for _ in range(reps))
    return (t_long - t_short) / (long - short)


def main():
    rows = []
    cases = [
        ("unicycle", 1000, 15), ("unicycle", 102400, 30),
        ("steering_unicycle", 10240, 15), ("steering_unicycle", 102400, 30),
        ("rate_limited_steering", 10240, 15),
        ("rate_limited_steering", 102400, 30),
        ("full_body", 10240, 15), ("full_body", 102400, 30),
        ("full_body", 1048576, 30), ("full_body", 102400, 100),
    ]
    for model, K, T in cases:
        for use_kernel in (False, True):
            try:
                per = measure(model, K, T, use_kernel)
                rows.append((model, K, T, "kernel" if use_kernel else "xla",
                             per * 1e3, K * (T - 1) / per / 1e9, 1.0 / per))
                print(rows[-1], flush=True)
            except Exception as e:
                print(f"FAILED {model} K={K} T={T} kernel={use_kernel}: {e}",
                      flush=True)

    auto = []
    auto.append("Full control update: sample + rollout (+ZMP) + cost + "
                "softmax + update.\n")
    auto.append("Chained-marginal, min over reps: the relay overlaps host "
                "dispatch with device execution inside a chain, so small-"
                "config marginals can undershoot the single-step dispatch "
                "floor; treat rows under ~0.3 ms as device-time estimates "
                "with ~1.2-2x run-to-run load variance (see the breakdown "
                "section).\n")
    auto.append("| model | K | T | path | ms/update | G prop/s | replan Hz |")
    auto.append("|---|---|---|---|---|---|---|")
    for r in rows:
        auto.append(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]:.2f} | "
                    f"{r[5]:.2f} | {r[6]:.0f} |")
    auto.append("\nMeasured serial C++ oracle (same semantics, host CPU): "
                "unicycle K=1000 T=15: 0.5 ms; full_body K=10000 T=15: "
                "10.7 ms; full_body K=100000 T=30: 279 ms.\n")
    auto.append("Fleet-scale batched control (`solver/batch.py`, diff-drive "
                "K=1024 T=15 per robot, B=256):")
    for name, use_kernel in (("vmapped XLA", False),
                             ("batched kernel (one Pallas launch)", True)):
        try:
            per = measure_fleet(256, 1024, 15, use_kernel)
            auto.append(f"{name}: {per*1e3:.2f} ms/tick = "
                        f"{256/per:,.0f} robot-updates/s.")
            print("fleet", name, per * 1e3, flush=True)
        except Exception as e:
            auto.append(f"{name}: FAILED ({e})")

    # splice into the marked region, preserving the hand-written sections
    BEGIN = "<!-- BEGIN AUTOGEN (scripts/bench_suite.py regenerates this block) -->"
    END = "<!-- END AUTOGEN -->"
    path = "/root/repo/BENCH_DETAIL.md"
    text = open(path).read()
    pre, _, rest = text.partition(BEGIN)
    _, _, post = rest.partition(END)
    assert pre and post, "autogen markers missing from BENCH_DETAIL.md"
    with open(path, "w") as f:
        f.write(pre + BEGIN + "\n" + "\n".join(auto) + "\n" + END + post)
    print("updated BENCH_DETAIL.md autogen block")


if __name__ == "__main__":
    main()
