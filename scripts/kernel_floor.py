#!/usr/bin/env python
"""Positive kernel-floor accounting: op-group costs that SUM to the step.

Round 4 falsified the three dependency hypotheses for the K=1M kernel floor
(artifacts/ab_tloop2.json) and left only a negative-space account (39% VPU
utilization, roofline superseded). This script produces the POSITIVE
account the verdict asked for: progressive re-enabling of the kernel's op
groups on an otherwise no-op body (never subtraction from full), so the
increments attribute the whole step and telescope to the production kernel
by construction:

  sample         PRNG bits + Box-Muller + clamp + u_out scratch write
  +loop          the t-loop: loop control, dynamic indexing, u_out reads
  +euler         kinematic integration (cos/sin heading, 5 state updates)
  +zmp           every non-path cost term + the ZMP chain
  +dist          the min-distance scan + path cost
  +update        the online softmax-weighted update   == production kernel

Disabled-arm dead code is anchored through a runtime-zero SMEM probe scalar
(kernels/rollout_cost.py KernelVariant.groups) so Mosaic cannot eliminate
the enabled groups. A seventh arm times the full mppi_step (lean) in the
same window, attributing the step's non-kernel remainder. All arms are
chained-marginal, interleaved per repetition (same measurement window),
min over reps — the repo's standard TPU methodology (bench.py docstring).

The closing "verdict" field is the one-paragraph floor statement the round
-4 review asked for; the sum-vs-production check is asserted at <= 10%.

Writes artifacts/kernel_floor.json. Reference for the serial loops this
kernel replaces: src/full_body_mppi.cpp:454-489.
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

ARMS = [
    ("sample", ("sample",), False),
    ("+loop", ("sample", "loop"), False),
    ("+euler", ("sample", "loop", "euler"), False),
    ("+zmp", ("sample", "loop", "euler", "zmp"), False),
    ("+dist", ("sample", "loop", "euler", "zmp", "dist"), False),
    ("+update", ("sample", "loop", "euler", "zmp", "dist"), True),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=1_048_576)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=4)
    p.add_argument("--long", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "kernel_floor.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.kernels import rollout_cost as rc
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    K, T = args.num_samples, args.horizon
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    model = get_model(cfg.model)
    mp = model.default_params
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(model.num_states, jnp.float32).at[1].set(
        float(course[0, 1]))
    dt = jnp.float32(0.1)
    ref = jnp.asarray(course[:T, :2], jnp.float32)
    u_prev = jnp.zeros((T - 1, 5), jnp.float32)
    scal = rc.pack_scalars(dt, cp, 0.0, mp, lam=float(sp.lam))

    # --- raw-kernel arms (chained on the cost output) ---------------------
    def make_fn(groups, accumulate):
        kv = rc.KernelVariant(groups=frozenset(groups))

        @jax.jit
        def f(seed):
            out = rc.fused_sample_rollout_cost(
                u_prev, sp.control_noise, sp.u_min, sp.u_max, ref, state,
                scal, seed, num_samples=K, model="full_body",
                accumulate=accumulate, variant=kv,
            )
            costs, _, s_row = out[:3]
            return seed + (costs[:1] > 1e30).astype(jnp.int32), s_row

        return f

    fns = {name: make_fn(groups, acc) for name, groups, acc in ARMS}

    # --- full-step arm (same window): production mppi_step, lean ----------
    step = jax.jit(functools.partial(mppi_step, cfg, use_kernel=True,
                                     lean=True), donate_argnums=(0,))
    make_ctrl = lambda: ControllerState.initial(
        jax.random.PRNGKey(0), T, model.num_controls)
    sargs = (state, path, dt, sp, cp)

    compile_s = {}
    for name, f in fns.items():
        t0 = time.perf_counter()
        seed, s_row = f(jnp.zeros(1, jnp.int32))
        float(jnp.sum(s_row))
        compile_s[name] = round(time.perf_counter() - t0, 1)
        print(f"compiled {name}: {compile_s[name]}s", flush=True)
    t0 = time.perf_counter()
    ctrl, res = step(make_ctrl(), *sargs)
    float(jnp.sum(res.u0))
    compile_s["full_step"] = round(time.perf_counter() - t0, 1)
    print(f"compiled full_step: {compile_s['full_step']}s", flush=True)

    def chain_kernel(f, iters):
        seed = jnp.zeros(1, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(iters):
            seed, s_row = f(seed)
        float(jnp.sum(s_row))
        return time.perf_counter() - t0

    def chain_step(iters):
        ctrl = make_ctrl()
        t0 = time.perf_counter()
        for _ in range(iters):
            ctrl, res = step(ctrl, *sargs)
        float(jnp.sum(res.u0))
        return time.perf_counter() - t0

    names = list(fns) + ["full_step"]
    t_s = {n: [] for n in names}
    t_l = {n: [] for n in names}
    for r in range(args.reps):
        for n in names:
            t_s[n].append(chain_step(args.short) if n == "full_step"
                          else chain_kernel(fns[n], args.short))
        for n in names:
            t_l[n].append(chain_step(args.long) if n == "full_step"
                          else chain_kernel(fns[n], args.long))
        print(f"rep {r + 1}/{args.reps} done", flush=True)

    ms = {n: (min(t_l[n]) - min(t_s[n])) / (args.long - args.short) * 1e3
          for n in names}
    arm_ms = {n: round(ms[n], 3) for n in names}
    # group increments telescope to the production-kernel arm by
    # construction; the non-trivial 10% check is that they (plus the
    # measured non-kernel step remainder) account for the independently
    # timed FULL production step in the same window.
    groups_ms, prev = {}, 0.0
    for n in list(fns):
        groups_ms[n] = round(ms[n] - prev, 3)
        prev = ms[n]
    kernel_ms = ms["+update"]
    step_ms = ms["full_step"]
    groups_ms["non_kernel_step"] = round(step_ms - kernel_ms, 3)
    pct = {n: round(100.0 * v / step_ms, 1) for n, v in groups_ms.items()}
    kernel_frac_err = abs(step_ms - kernel_ms) / step_ms

    out = {
        "config": {"model": "full_body", "K": K, "T": T, "mode": "rng",
                   "method": "progressive re-enable, chained-marginal, "
                             "interleaved same-window, min over "
                             f"{args.reps} reps"},
        "arm_ms": arm_ms,
        "group_increment_ms": groups_ms,
        "group_pct_of_step": pct,
        "kernel_ms": round(kernel_ms, 3),
        "full_step_ms": round(step_ms, 3),
        "sum_check": {
            "sum_of_groups_ms": round(sum(groups_ms.values()), 3),
            "kernel_vs_step_rel_gap": round(kernel_frac_err, 4),
            "ok": bool(kernel_frac_err <= 0.10),
            "note": "increments telescope to the kernel arm by "
                    "construction; ok requires the kernel to account for "
                    ">=90% of the independently timed production step",
        },
        "compile_s": compile_s,
        "device": str(jax.devices()[0]),
    }
    ranked = sorted(((v, n) for n, v in groups_ms.items()), reverse=True)
    top = ", ".join(f"{n} {v:.2f} ms ({pct[n]}%)" for v, n in ranked[:3])
    out["verdict"] = (
        f"Positive accounting at K={K} T={T}: the production kernel "
        f"measures {out['kernel_ms']} ms and the full lean step "
        f"{out['full_step_ms']} ms in the same window; the three largest "
        f"op groups are {top}. Group increments come from progressive "
        f"re-enabling on a probe-anchored no-op body (never subtraction "
        f"from full) and telescope to the kernel arm by construction; "
        f"the kernel accounts for "
        f"{round(100 * kernel_ms / step_ms, 1)}% of the step."
    )
    with open(args.out, "w") as fobj:
        json.dump(out, fobj, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
