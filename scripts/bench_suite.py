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
            if use_kernel and K % 1024 != 0:
                continue  # smallest kernel tile is 8 rows x 128 lanes
            try:
                per = measure(model, K, T, use_kernel)
                rows.append((model, K, T, "kernel" if use_kernel else "xla",
                             per * 1e3, K * (T - 1) / per / 1e9, 1.0 / per))
                print(rows[-1], flush=True)
            except Exception as e:
                print(f"FAILED {model} K={K} T={T} kernel={use_kernel}: {e}",
                      flush=True)

    with open("/root/repo/BENCH_DETAIL.md", "w") as f:
        f.write("# Benchmark detail (TPU v5e, 1 chip; chained-marginal timing)\n\n")
        f.write("Full control update: sample + rollout (+ZMP) + cost + softmax "
                "+ update.\n\n")
        f.write("Chained-marginal, min over reps: the relay overlaps host "
                "dispatch with device execution inside a chain, so small-"
                "config marginals can undershoot the single-step dispatch "
                "floor; treat rows under ~0.3 ms as device-time estimates "
                "with ~1.2-2x run-to-run load variance (see the breakdown "
                "section).\n\n")
        f.write("| model | K | T | path | ms/update | G prop/s | replan Hz |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]:.2f} | "
                    f"{r[5]:.2f} | {r[6]:.0f} |\n")
        f.write("\nMeasured serial C++ oracle (same semantics, host CPU): "
                "unicycle K=1000 T=15: 0.5 ms; full_body K=10000 T=15: 10.7 ms; "
                "full_body K=100000 T=30: 279 ms.\n")
        f.write("\nFleet-scale batched control (`solver/batch.py`, diff-drive "
                "K=1024 T=15 per robot, B=256):\n")
        for name, use_kernel in (("vmapped XLA", False),
                                 ("batched kernel (one Pallas launch)", True)):
            try:
                per = measure_fleet(256, 1024, 15, use_kernel)
                f.write(f"{name}: {per*1e3:.2f} ms/tick = "
                        f"{256/per:,.0f} robot-updates/s.\n")
                print("fleet", name, per * 1e3, flush=True)
            except Exception as e:
                f.write(f"{name}: FAILED ({e})\n")
        f.write(EXTRA_SECTIONS)
    print("wrote BENCH_DETAIL.md")


# Hand-maintained section re-emitted on regeneration. The measured
# multi-process numbers regenerate with:
#   scripts/multiprocess_worker.py --num-samples 131072 --horizon 30
#   (2 processes x 4 devices vs 1 process x 8; see tests/test_multiprocess.py)
EXTRA_SECTIONS = """
## Flagship step breakdown + VPU roofline

Ablation of the K=102400 T=30 full-body kernel step by chained-marginal
timing of variant programs (scripts/profile_step.py; committed run:
artifacts/profile_step.json, raw per-rep marginals included). Same-config
timings vary ~1.2-2x with relay / service load; the script times all rungs
interleaved with paired short/long chains and a trimmed estimator, but
slices below ~0.1 ms are still at the noise floor — treat the small deltas
as bounds, not point values:

- kernel compute: ~0.45-0.59 ms (the fused sample+rollout+cost+update pass)
- per-step dispatch/relay floor: ~0.08-0.20 ms (a trivial chained program
  costs this much; irreducible at host-loop granularity through the tunnel)
- result-output materialization: ~0.1 ms — each jit output buffer costs
  ~10-20 us through the relay (measured by a 3-output vs 9-output floor
  program: 0.11 vs 0.16-0.20 ms). `mppi_step(lean=True)` drops the
  diagnostic outputs: same-load bench.py A/B measured 0.869 ms lean vs
  0.968 ms full (replan 1150 vs 1034 Hz).
- re-roll compute: ~0 — the closed-form cumsum re-roll is free next to the
  kernel (stubbing it to zeros changes nothing outside noise); resample and
  softmax stats are each <0.05 ms.

Round-2 optimizations: the optimal-sequence re-roll and the XLA pipeline's
sampling rollout use a scan-free closed form (prefix sums over control
integrals, ops/rollout.py rollout_closed_form) — interleaved A/B measured
the XLA full-body K=102400 T=30 pipeline at 7.9 ms vs 10.1 ms for the scan
form (-21%); the kernel path is unchanged within noise (its rollout was
already fused). Kernel tile heights now include non-power-of-two candidates
(kernels/rollout_cost.py tile_rows): K=102400 is 800 lane-rows, which 64
does not divide but 40 does — rows=40 vs the old fallback rows=32 measured
0.91 vs 1.15 ms (interleaved min-of-6) at the flagship config.
`MPPISolver(use_kernel="auto")` picks the kernel only above the measured
~3e5 propagations-per-update crossover (and only on a real TPU backend —
the RNG-mode kernel has no CPU/GPU lowering). `elite_frac` on the kernel
path costs ~1.3-1.5x a vanilla step, not 2x: the first (threshold-finding)
pass skips the online update accumulation (measured interleaved at
K=102400 T=30: elite 1.49 ms vs vanilla 0.94-1.20 ms).

Roofline (scripts/roofline.py): this workload is VPU-bound — the only
matmul is the K-contraction, so MXU MFU is structurally ~0. The kernel
executes ~350 f32 vector-op equivalents per state propagation (min-distance
scan 150, Box-Muller sampling ~120, ZMP+cost 40, Euler 26, online update 15;
transcendentals counted at 8 ops each). At the K=1M point (4.3 G props/s)
that sustains ~1.5e12 vector ops/s = ~39% of the v5e VPU ceiling
(~3.85e12/s); the remaining gap is min-op serialization in the distance
scan and transcendental latency in Box-Muller. Headroom, not stranded:
an inverse-CDF sampler and an expanded-form distance (numerics permitting)
could buy ~1.5x more, at parity risk documented in the kernel.

## Multi-process (multi-host-path) scaling — MEASURED

Real 2-process `jax.distributed` execution (gRPC coordinator + gloo CPU
collectives — the CPU stand-in for cross-host DCN; no pod hardware in this
container). Workload: full-body solve, K=131072, T=30, f32, RNG mode,
"samples" mesh over 8 virtual CPU devices; steady-state chained steps
(scripts/multiprocess_worker.py, reproduced by tests/test_multiprocess.py):

| processes | devices | ms/update | scaling efficiency |
|---|---|---|---|
| 1 | 8 (one process) | 656 | 1.00 |
| 2 | 4 + 4 (cross-process collectives) | 672 | 0.976 |
| 4 | 2 + 2 + 2 + 2 | 687 | 0.955 |

u_opt is **bit-identical** (max abs diff 0.0) across the 1-, 2- and
4-process runs with the same injected noise — the pmin/psum reductions are
globally exact across every process boundary. The 2-5% overhead is the gloo
round-trip for the three per-step collectives (pmin baseline + psum
normalizer + psum of the (T-1)xU weighted-update partial, 582 B payload at
T=30 U=5); on a TPU pod the same three collectives ride ICI/DCN. Correctness
of the distributed path is asserted in CI by `tests/test_multiprocess.py`,
which launches both worker processes and checks them against the
single-process 8-device solve at rtol=1e-12.

Analysis for real pods: work per chip is K/N independent rollouts with zero
cross-sample traffic, so weak scaling is bound only by collective latency
(ICI ~us: <1% at kHz replan rates; DCN ~10-100 us: <5% at 1 kHz). Strong
scaling at K=1M over 8 chips puts each chip at K=131072 — near its ~1 ms
latency floor — for an expected ~7x on the single-chip number.
"""


if __name__ == "__main__":
    main()
