#!/usr/bin/env python
"""A/B: distance-scan form x loop structure in the fused kernel.

Times all four combinations of {expanded (3-op FMA+min), difference (5-op)}
distance forms x {chunked fori_loop, full constant-index unroll} scan
structures of kernels/rollout_cost.py INTERLEAVED on the real chip
(chained-marginal timing, min over reps — see bench.py docstring), plus each
variant's trace+compile wall time. Writes artifacts/ab_mindist.json; the
production defaults live in KernelVariant's field defaults
(kernels/rollout_cost.py dist_form/mindist_unroll) — arms are passed
explicitly here, nothing is monkey-patched. Round-5 caveat recorded in the
artifact: the chunk-vs-full delta is below reproducibility at current
relay load, so a default change needs a repeat-run confirmation.

Run with nothing else on the TPU: same-config timings vary ~1.2-2x with
relay/service load, which interleaving cancels but concurrency does not.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=1_048_576,
                   help="K=1M default: signal >> relay noise")
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=4)
    p.add_argument("--long", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "ab_mindist.json"))
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

    variants = [
        ("expanded", "chunk"),
        ("expanded", "full"),
        ("difference", "chunk"),
        ("difference", "full"),
    ]
    steps, compile_s = {}, {}
    for form, unroll in variants:
        kv = rc.KernelVariant(dist_form=form, mindist_unroll=unroll)
        step = jax.jit(
            functools.partial(mppi_step, cfg, use_kernel=True, lean=True,
                              kernel_variant=kv),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        ctrl, res = step(make_ctrl(), *sargs)
        fetch(res)
        compile_s[(form, unroll)] = time.perf_counter() - t0
        steps[(form, unroll)] = step
        print(f"compiled {form}/{unroll}: {compile_s[(form, unroll)]:.1f}s",
              flush=True)

    def chain(step, iters):
        ctrl = make_ctrl()
        t0 = time.perf_counter()
        for _ in range(iters):
            ctrl, res = step(ctrl, *sargs)
        fetch(res)
        return time.perf_counter() - t0

    t_short = {v: [] for v in variants}
    t_long = {v: [] for v in variants}
    for _ in range(args.reps):  # interleave every arm within each rep
        for v in variants:
            t_short[v].append(chain(steps[v], args.short))
        for v in variants:
            t_long[v].append(chain(steps[v], args.long))

    results = {}
    for form, unroll in variants:
        ms = (min(t_long[(form, unroll)]) - min(t_short[(form, unroll)])) \
            / (args.long - args.short) * 1e3
        results[f"{form}/{unroll}"] = {
            "step_ms": round(ms, 3),
            "gprops_per_s": round(K * (T - 1) / ms / 1e6, 2),
            "compile_s": round(compile_s[(form, unroll)], 1),
        }
        print(f"{form}/{unroll}: {ms:.3f} ms "
              f"({results[f'{form}/{unroll}']['gprops_per_s']} G props/s)",
              flush=True)

    out = {"model": cfg.model, "num_samples": K, "horizon": T,
           "method": "chained-marginal, min over interleaved reps",
           "results": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
