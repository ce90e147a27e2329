#!/usr/bin/env python
"""A/B: tile height at the flagship config now that any K is maskable.

K=102400 is exactly divisible by rows=40 tiles but not rows=64; before the
masked-tail support the kernel was forced to rows=40 (round 2 measured 40
vs the then-fallback 32: 0.91 vs 1.15 ms). With masking, rows=64 runs as
106496 lanes with 4096 zero-weighted — this script measures whether the
taller tile's control-overhead amortization beats the 4% padded work.
Interleaved chained-marginal timing; writes artifacts/ab_tile_rows.json.
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
    p.add_argument("--num-samples", type=int, default=102_400)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", type=int, default=72)
    p.add_argument("--reps", type=int, default=6)
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

    orig_tile_rows = rc.tile_rows
    steps = {}
    for rows in (40, 64):
        rc.tile_rows = (lambda r: (lambda *a, **k: r))(rows)
        step = jax.jit(
            functools.partial(mppi_step, cfg, use_kernel=True, lean=True),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        ctrl, res = step(make_ctrl(), *sargs)
        fetch(res)
        print(f"compiled rows={rows}: {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[rows] = step
    rc.tile_rows = orig_tile_rows

    def chain(step, iters):
        ctrl = make_ctrl()
        t0 = time.perf_counter()
        for _ in range(iters):
            ctrl, res = step(ctrl, *sargs)
        fetch(res)
        return time.perf_counter() - t0

    t_s = {r: [] for r in steps}
    t_l = {r: [] for r in steps}
    for _ in range(args.reps):
        for r, f in steps.items():
            t_s[r].append(chain(f, args.short))
        for r, f in steps.items():
            t_l[r].append(chain(f, args.long))

    results = {}
    for r in steps:
        ms = (min(t_l[r]) - min(t_s[r])) / (args.long - args.short) * 1e3
        results[f"rows_{r}"] = round(ms, 3)
        print(f"rows={r}: {ms:.3f} ms", flush=True)
    out = {"num_samples": K, "horizon": T, "results": results}
    path_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "ab_tile_rows.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
