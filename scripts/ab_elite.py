#!/usr/bin/env python
"""Measure the elite_frac kernel overhead after the costs-free second pass.

Round 3 measured elite_frac at 1.3-1.5x vanilla on the kernel path because
the second (thresholded-update) pass recomputed the full rollout + distance
scan + ZMP chain it immediately discarded. The second pass now streams pass
1's costs back in and only regenerates controls + accumulates
(kernels/rollout_cost.py costs_in). This script re-measures the overhead
same-window interleaved (vanilla vs elite=0.25) at the flagship and K=1M
shapes and writes artifacts/ab_elite.json for BENCH_DETAIL.md.
"""

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
    p.add_argument("--short", type=int, default=6)
    p.add_argument("--long", type=int, default=30)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    results = {}
    for K, T in ((102_400, 30), (1_048_576, 30)):
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

        arms = {}
        for name, opts in (
            ("vanilla", {}),
            ("elite_0.25", {"elite_frac": 0.25}),
        ):
            step = jax.jit(
                functools.partial(mppi_step, cfg, use_kernel=True, lean=True,
                                  **opts),
                donate_argnums=(0,),
            )
            ctrl, res = step(make_ctrl(), *sargs)
            fetch(res)
            arms[name] = step

        def chain(step, iters):
            ctrl = make_ctrl()
            t0 = time.perf_counter()
            for _ in range(iters):
                ctrl, res = step(ctrl, *sargs)
            fetch(res)
            return time.perf_counter() - t0

        t_s = {m: [] for m in arms}
        t_l = {m: [] for m in arms}
        for _ in range(args.reps):
            for m, f in arms.items():
                t_s[m].append(chain(f, args.short))
            for m, f in arms.items():
                t_l[m].append(chain(f, args.long))
        ms = {
            m: (min(t_l[m]) - min(t_s[m])) / (args.long - args.short) * 1e3
            for m in arms
        }
        results[f"K={K} T={T}"] = {
            "vanilla_ms": round(ms["vanilla"], 3),
            "elite_ms": round(ms["elite_0.25"], 3),
            "overhead_x": round(ms["elite_0.25"] / ms["vanilla"], 3),
        }
        print(f"K={K}: vanilla {ms['vanilla']:.3f} ms, elite "
              f"{ms['elite_0.25']:.3f} ms "
              f"({ms['elite_0.25']/ms['vanilla']:.2f}x)", flush=True)

    out = {"model": "full_body", "elite_frac": 0.25,
           "second_pass": "costs-free (costs_in)", "results": results,
           "r3_recompute_overhead_x": "1.3-1.5 (BENCH_DETAIL.md)"}
    path_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "ab_elite.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
