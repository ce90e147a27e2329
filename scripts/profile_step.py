#!/usr/bin/env python
"""Ablation breakdown of the flagship kernel-path control step on TPU.

VERDICT r1 weak#1: ~40% of the 1.24 ms K=102400 full-body step was
unaccounted fixed overhead. This script times (chained-marginal, same
methodology as bench.py) a ladder of step variants, each chained through its
own output so the device must execute serially:

  full        complete mppi_step (kernel path) — the headline workload
  lean        mppi_step(lean=True) — identical solver math, StepResult
              carries only u_opt/u0. full - lean is the direct per-step cost
              of materializing the diagnostic output buffers (ref window,
              planned path, cost stats) through the relay
  stub_reroll full step with _opt_rollout returning zeros — isolates the
              re-roll COMPUTE from the StepResult output materialization
              (same output pytree, no cumsum work)
  no_reroll   ControllerState-only core (kernel + softmax stats + finish):
              drops the re-roll AND the StepResult outputs — the delta vs
              stub_reroll is the per-step cost of materializing the result
              buffers (u_opt/u0/ref/opt_states/stats) through the relay
  no_resample minus resample_reference (reference window precomputed)
  kernel_only just the fused kernel + the finishing partial-sum reduction
  floor       a trivial chained add — the per-step dispatch/relay floor

The deltas between rungs attribute the non-kernel time. Writes
artifacts/profile_step.json.

    python scripts/profile_step.py --num-samples 102400 --horizon 30
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


def chain_time(step, make_init, iters, fetch):
    # make_init: FACTORY — the step donates its carry, so every chain needs
    # a fresh buffer (reusing one raises InvalidArgument on the donated arg)
    c = make_init()
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    fetch(c)
    return time.perf_counter() - t0


SHORT, LONG = 8, 72


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=102_400)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--out", default="artifacts/profile_step.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.core.random import next_cycle_key
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.ops.softmax_update import softmax_weights
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
    from ccv_mppi_path_tracker_tpu.solver import mppi_step
    from ccv_mppi_path_tracker_tpu.solver.mppi import _kernel_sample_rollout_cost

    K, T = args.num_samples, args.horizon
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    model = get_model(cfg.model)
    path = PathBuffer.from_points(course, 0.1)
    state = jnp.zeros(5, jnp.float32).at[1].set(float(course[0, 1]))
    dt = jnp.float32(0.1)
    mk = lambda: ControllerState.initial(jax.random.PRNGKey(0), T, 5)
    g = jax.jit(lambda x: jnp.sum(x))

    # Rungs register (compile + warm) first, then all are timed INTERLEAVED
    # round-robin — service load through the relay drifts on the ~minute
    # scale, so sequentially-timed rungs would alias that drift into the
    # attribution deltas. Interleaving puts every variant under the same
    # load profile; min-over-reps then strips the additive noise.
    variants = {}

    def timeit(name, step, make_init, fetch):
        c = step(make_init())
        fetch(c)
        variants[name] = (step, make_init, fetch)

    # --- full step ----------------------------------------------------------
    full = jax.jit(functools.partial(mppi_step, cfg, use_kernel=True),
                   donate_argnums=(0,))
    timeit(
        "full",
        lambda c: full(c, state, path, dt, sp, cp)[0],
        mk,
        lambda c: float(g(c.u_prev)),
    )

    lean_step = jax.jit(
        functools.partial(mppi_step, cfg, use_kernel=True, lean=True),
        donate_argnums=(0,),
    )
    timeit(
        "lean",
        lambda c: lean_step(c, state, path, dt, sp, cp)[0],
        mk,
        lambda c: float(g(c.u_prev)),
    )

    # stub_reroll: the full step with the optimal-sequence re-roll replaced
    # by a zeros constant — identical output pytree, so the delta vs "full"
    # is the re-roll COMPUTE alone (measured ~0: the closed-form cumsum is
    # free next to the kernel).
    from ccv_mppi_path_tracker_tpu.solver import mppi as _mppi_mod

    _orig_opt_rollout = _mppi_mod._opt_rollout
    _mppi_mod._opt_rollout = (
        lambda mn, m, s, u, d: jnp.zeros((T, 5), jnp.float32)
    )
    stub = jax.jit(functools.partial(mppi_step, cfg, use_kernel=True),
                   donate_argnums=(0,))
    timeit(
        "stub_reroll",
        lambda c: stub(c, state, path, dt, sp, cp)[0],
        mk,
        lambda c: float(g(c.u_prev)),
    )
    _mppi_mod._opt_rollout = _orig_opt_rollout

    # no_reroll: key chain + resample + kernel + softmax stats + finish,
    # WITHOUT the optimal-sequence re-roll or the StepResult outputs
    def core(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        ref = resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref, dt, sp, cp, model.default_params,
            use_key, None, cfg.num_samples, False,
        )
        _, stats = softmax_weights(costs, sp.lam)
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        u_opt = (u_num / jnp.sum(s_row)) + 0.0 * stats["min_cost"]
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("no_reroll", jax.jit(core, donate_argnums=(0,)), mk,
           lambda c: float(g(c.u_prev)))

    # no_resample additionally drops the reference-window resample; the ref
    # must then come in as a constant-folded input — close over a concrete one
    ref_const = jax.jit(
        lambda: resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
    )()

    def core_noresample(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref_const, dt, sp, cp,
            model.default_params, use_key, None, cfg.num_samples, False,
        )
        _, stats = softmax_weights(costs, sp.lam)
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        # keep the stats live (XLA would DCE an unused softmax pass)
        u_opt = (u_num / jnp.sum(s_row)) + 0.0 * stats["min_cost"]
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("no_resample", jax.jit(core_noresample, donate_argnums=(0,)),
           mk, lambda c: float(g(c.u_prev)))

    # kernel_only: fused kernel + finishing sums, no softmax stats either
    def kernel_only(ctrl):
        carry_key, use_key = next_cycle_key(ctrl.key)
        costs, u_rows, s_row, _ = _kernel_sample_rollout_cost(
            cfg, ctrl.u_prev, state, ref_const, dt, sp, cp,
            model.default_params, use_key, None, cfg.num_samples, False,
        )
        u_num = jnp.sum(u_rows, axis=(-2, -1)).reshape(T - 1, 5)
        u_opt = u_num / jnp.sum(s_row)
        return ControllerState(u_prev=u_opt, key=carry_key, step=ctrl.step + 1)

    timeit("kernel_only", jax.jit(kernel_only, donate_argnums=(0,)),
           mk, lambda c: float(g(c.u_prev)))

    # floor: trivial chained program — measures dispatch + chain latency
    floor = jax.jit(
        lambda c: ControllerState(
            u_prev=c.u_prev + 1e-7, key=c.key, step=c.step + 1
        ),
        donate_argnums=(0,),
    )
    timeit("floor", floor, mk, lambda c: float(g(c.u_prev)))

    # Each rep measures a variant's (short, long) chain back-to-back — the
    # pair sits in the same load regime, so its marginal is (load factor) x
    # (true marginal); min over reps picks the least-loaded regime. Taking
    # min(long) - min(short) across DIFFERENT reps instead can pair
    # incompatible regimes and even go negative.
    marginals = {n: [] for n in variants}
    for _ in range(args.reps):
        for n, (s, mi, f) in variants.items():
            ts = chain_time(s, mi, SHORT, f)
            tl = chain_time(s, mi, LONG, f)
            marginals[n].append((tl - ts) / (LONG - SHORT) * 1e3)
    # Robust location: the raw min can UNDERSHOOT (a load spike during the
    # short chain but not the long one deflates that rep's marginal), so use
    # the mean of the 2nd..4th smallest reps — insensitive to both the
    # deflated-min fluke and the inflated tail.
    results = {}
    raw = {}
    for n in variants:
        s = sorted(marginals[n])
        ms = sum(s[1:4]) / len(s[1:4])
        results[n] = round(ms, 3)
        raw[n] = [round(v, 3) for v in marginals[n]]
        print(f"{n:12s} {ms:7.3f} ms  (reps: "
              + " ".join(f"{v:.3f}" for v in marginals[n]) + ")", flush=True)

    out = {
        "num_samples": K,
        "horizon": T,
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ms": results,
        "rep_marginals_ms": raw,
        "attribution_ms": {
            "reroll_compute": round(
                results["full"] - results["stub_reroll"], 3
            ),
            "result_outputs": round(results["full"] - results["lean"], 3),
            "resample": round(results["no_reroll"] - results["no_resample"], 3),
            "softmax_stats": round(
                results["no_resample"] - results["kernel_only"], 3
            ),
            "kernel_compute": round(
                results["kernel_only"] - results["floor"], 3
            ),
            "dispatch_floor": results["floor"],
        },
    }
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
