#!/usr/bin/env python
"""A/B: time-loop structure in the fused kernel (fori vs constant-index
unroll). Discriminates whether dynamic u_out VMEM indexing / per-iteration
loop overhead is what holds the t-loop at ~3.6 ms of the 4.8 ms K=1M step
(artifacts/kernel_ablation.json). Writes artifacts/ab_tloop.json."""

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


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=1_048_576)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=4)
    p.add_argument("--long", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

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
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(model.num_states, jnp.float32).at[1].set(
        float(course[0, 1]))
    dt = jnp.float32(0.1)
    sargs = (state, path, dt, sp, cp)
    make_ctrl = lambda: ControllerState.initial(
        jax.random.PRNGKey(0), T, model.num_controls)
    fetch = lambda res: float(jnp.sum(res.u0))

    steps, compile_s = {}, {}
    for mode in ("fori", "unroll"):
        step = jax.jit(
            functools.partial(mppi_step, cfg, use_kernel=True, lean=True,
                              kernel_variant=rc.KernelVariant(tloop=mode)),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        ctrl, res = step(make_ctrl(), *sargs)
        fetch(res)
        compile_s[mode] = time.perf_counter() - t0
        print(f"compiled {mode}: {compile_s[mode]:.1f}s", flush=True)
        steps[mode] = step

    def chain(step, iters):
        ctrl = make_ctrl()
        t0 = time.perf_counter()
        for _ in range(iters):
            ctrl, res = step(ctrl, *sargs)
        fetch(res)
        return time.perf_counter() - t0

    t_s = {m: [] for m in steps}
    t_l = {m: [] for m in steps}
    for _ in range(args.reps):
        for m, f in steps.items():
            t_s[m].append(chain(f, args.short))
        for m, f in steps.items():
            t_l[m].append(chain(f, args.long))

    results = {}
    for m in steps:
        ms = (min(t_l[m]) - min(t_s[m])) / (args.long - args.short) * 1e3
        results[m] = {"step_ms": round(ms, 3),
                      "compile_s": round(compile_s[m], 1)}
        print(f"{m}: {ms:.3f} ms", flush=True)
    out = {"num_samples": K, "horizon": T, "results": results}
    path_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "ab_tloop.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
