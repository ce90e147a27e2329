#!/usr/bin/env python
"""Measure the elite_frac kernel overhead after the costs-free second pass.

Round 3 measured elite_frac at 1.3-1.5x vanilla on the kernel path because
the second (thresholded-update) pass recomputed the full rollout + distance
scan + ZMP chain it immediately discarded. The second pass now streams pass
1's costs back in and only regenerates controls + accumulates
(kernels/rollout_cost.py costs_in). Round 5 replaced the threshold select
(the next bottleneck: a ~2.5 ms host jnp.sort at K=1M) with the
scatter-free compare+sum radix descent (ops/softmax_update.py); this
script ALSO times the select in isolation — sort vs digit widths 1/2/4/8 —
chained same-window, so the artifact carries the full decomposition.
Re-measures the step overhead same-window interleaved (vanilla vs
elite=0.25) at the flagship and K=1M shapes and writes
artifacts/ab_elite.json for BENCH_DETAIL.md.
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
    from ccv_mppi_path_tracker_tpu.ops.softmax_update import elite_threshold
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    # --- select-in-isolation: sort vs scatter-free digit descent ----------
    # chained on the output (threshold folded back into the input) so the
    # relay cannot overlap iterations; same-window interleaved across arms
    select_ms = {}
    for K in (102_400, 1_048_576):
        key = jax.random.PRNGKey(0)
        costs = jax.random.uniform(key, (K,), jnp.float32, 1.0, 100.0)

        def make(fn):
            @jax.jit
            def f(c):
                t = fn(c)
                return c + (t - t)  # carry dependency, keep shape
            return f

        arms = {"sort": make(lambda c: jnp.sort(c)[int(round(0.25 * K)) - 1])}
        for db in (1, 2, 4, 8):
            arms[f"digits{db}"] = make(
                lambda c, db=db: elite_threshold(c, 0.25, digit_bits=db))
        for f in arms.values():
            f(costs).block_until_ready()
        t_s = {m: [] for m in arms}
        t_l = {m: [] for m in arms}
        for _ in range(args.reps):
            for m, f in arms.items():
                for dst, iters in ((t_s, args.short), (t_l, args.long)):
                    c = costs
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        c = f(c)
                    float(jnp.sum(c[:1]))
                    dst[m].append(time.perf_counter() - t0)
        select_ms[f"K={K}"] = {
            m: round((min(t_l[m]) - min(t_s[m]))
                     / (args.long - args.short) * 1e3, 3)
            for m in arms
        }
        print(f"select K={K}: {select_ms[f'K={K}']}", flush=True)

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

        # Uniform arm protocol: f(ctrl, thresh, *sargs) -> (ctrl, thresh',
        # res) so the chained loop can thread the stale-elite threshold;
        # vanilla/two-pass arms carry the threshold untouched.
        arms = {}
        for name, opts, stale in (
            ("vanilla", {}, False),
            ("elite_0.25", {"elite_frac": 0.25}, False),
            ("elite_0.25_stale", {"elite_frac": 0.25}, True),
        ):
            if stale:
                def raw(ctrl, thresh, *a, _o=opts):
                    ctrl, res = mppi_step(cfg, ctrl, *a, use_kernel=True,
                                          lean=True, elite_stale_thresh=thresh,
                                          **_o)
                    return ctrl, res.stats["elite_thresh"], res
            else:
                def raw(ctrl, thresh, *a, _o=opts):
                    ctrl, res = mppi_step(cfg, ctrl, *a, use_kernel=True,
                                          lean=True, **_o)
                    return ctrl, thresh, res
            step = jax.jit(raw, donate_argnums=(0,))
            ctrl, th, res = step(make_ctrl(), jnp.float32(jnp.inf), *sargs)
            fetch(res)
            arms[name] = step

        def chain(step, iters):
            ctrl = make_ctrl()
            thresh = jnp.float32(jnp.inf)
            t0 = time.perf_counter()
            for _ in range(iters):
                ctrl, thresh, res = step(ctrl, thresh, *sargs)
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
            "elite_stale_ms": round(ms["elite_0.25_stale"], 3),
            "stale_overhead_x": round(
                ms["elite_0.25_stale"] / ms["vanilla"], 3),
        }
        print(f"K={K}: vanilla {ms['vanilla']:.3f} ms, elite "
              f"{ms['elite_0.25']:.3f} ms "
              f"({ms['elite_0.25']/ms['vanilla']:.2f}x), stale "
              f"{ms['elite_0.25_stale']:.3f} ms "
              f"({ms['elite_0.25_stale']/ms['vanilla']:.2f}x)", flush=True)

    out = {"model": "full_body", "elite_frac": 0.25,
           "second_pass": "costs-free (costs_in), controls drawn inline in "
                          "the update loop (no u_out scratch round trip)",
           "select_isolation_ms": select_ms,
           "results": results,
           "floor_statement": (
               "The exact two-pass flow's K=1M overhead is structural, not "
               "op content: the scatter-free digit-descent select costs "
               "0.14 ms (11x under the sort it replaced) and the kernel-"
               "floor table (artifacts/kernel_floor.json) prices pass 2's "
               "actual ops - sampling regeneration 0.14 ms + masked online "
               "update 0.08 ms - at ~0.25 ms, yet pass 2 measures ~2.9 ms "
               "in isolation: per-tile program overhead with no rollout "
               "body to amortize it. Exactness therefore floors near "
               "1.35-1.4x at K=1M; the opt-in single-pass stale-threshold "
               "mode (mask this cycle at last cycle's exact threshold, "
               "elite_stale_thresh) removes pass 2 entirely and measures "
               "~1.0x. Sub-ms arms at K=102400 sit at the relay noise "
               "floor (~0.1 ms), which is why ratios there can dip below "
               "1.0."
           ),
           "history": {"r3_recompute_overhead_x": "1.3-1.5",
                       "r4_sort_select_overhead_x": "1.26 / 1.58 (K=102k/1M)"
                       }}
    path_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "ab_elite.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
