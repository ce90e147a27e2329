#!/usr/bin/env python
"""What actually bounds the fused kernel? Direct-call ablation at K=1M.

The roofline (artifacts/roofline.json) counts ~350 vector-op equivalents per
propagation, with the min-distance scan (150) and Box-Muller (~120) as the
big groups — yet cutting the scan to 3 ops/point (expanded form) moved the
step only ~2% (artifacts/ab_mindist.json). This script isolates each group
by timing variants of the RAW kernel call (chained-marginal, interleaved):

  base        full kernel, R=30 reference points, RNG mode
  mindist_r1  R=1 (scan cost ~ 1/30 of base: isolates the whole scan group)
  cheap_rng   Box-Muller's log/sqrt/cos/sin replaced by a sum-of-uniforms
              pseudo-normal (same prng_random_bits count: isolates the
              transcendental cost, not the bits generation)
  no_update   accumulate=False (drops the online softmax update group)

Writes artifacts/kernel_ablation.json.
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
    p.add_argument("--num-samples", type=int, default=1_048_576)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--short", type=int, default=4)
    p.add_argument("--long", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "kernel_ablation.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
    from ccv_mppi_path_tracker_tpu.kernels import rollout_cost as rc

    K, T = args.num_samples, args.horizon
    cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
    from ccv_mppi_path_tracker_tpu.models import get_model

    mp = get_model("full_body").default_params
    rng = np.random.RandomState(0)
    u_prev = jnp.asarray(rng.randn(T - 1, 5) * 0.05, jnp.float32)
    state0 = jnp.zeros(5, jnp.float32)
    scal = rc.pack_scalars(jnp.float32(0.1), cp, 0.0, mp, lam=float(sp.lam))

    def make_fn(num_ref, accumulate=True):
        ref = jnp.asarray(course[:num_ref, :2], jnp.float32)

        @jax.jit
        def f(seed):
            out = rc.fused_sample_rollout_cost(
                u_prev, sp.control_noise, sp.u_min, sp.u_max, ref, state0,
                scal, seed, num_samples=K, model="full_body",
                accumulate=accumulate,
            )
            costs, _, s_row = out[:3]
            # chain the next call on this one's result (serializes the chain)
            return seed + (costs[:1] > 1e30).astype(jnp.int32), s_row

        return f

    def cheap_pair(shape):
        # same two prng_random_bits draws as Box-Muller, zero transcendentals
        def unif():
            from jax.experimental.pallas import tpu as pltpu

            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            hi = pltpu.bitcast(bits >> 9, jnp.int32)
            return hi.astype(jnp.float32) * (1.0 / (1 << 23))

        u1, u2 = unif(), unif()
        s6 = 2.449489742783178  # sqrt(6): var(u1+u2-1) = 1/6
        return (u1 + u2 - 1.0) * s6, (u1 - u2) * s6

    fns = {}
    fns["base"] = make_fn(T)
    fns["mindist_r1"] = make_fn(1)
    fns["no_update"] = make_fn(T, accumulate=False)
    orig = rc._normals_pair
    rc._normals_pair = cheap_pair
    fns["cheap_rng"] = make_fn(T)  # traced lazily — patch must live past call
    compile_s = {}
    for name, f in fns.items():
        t0 = time.perf_counter()
        seed, s_row = f(jnp.zeros(1, jnp.int32))
        float(jnp.sum(s_row))
        compile_s[name] = time.perf_counter() - t0
        print(f"compiled {name}: {compile_s[name]:.1f}s", flush=True)
    rc._normals_pair = orig

    def chain(f, iters):
        seed = jnp.zeros(1, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(iters):
            seed, s_row = f(seed)
        float(jnp.sum(s_row))
        return time.perf_counter() - t0

    t_s = {n: [] for n in fns}
    t_l = {n: [] for n in fns}
    for _ in range(args.reps):
        for n, f in fns.items():
            t_s[n].append(chain(f, args.short))
        for n, f in fns.items():
            t_l[n].append(chain(f, args.long))

    results = {}
    for n in fns:
        ms = (min(t_l[n]) - min(t_s[n])) / (args.long - args.short) * 1e3
        results[n] = {"ms": round(ms, 3), "compile_s": round(compile_s[n], 1)}
        print(f"{n}: {ms:.3f} ms", flush=True)

    out = {"num_samples": K, "horizon": T, "model": "full_body",
           "method": "chained-marginal, min over interleaved reps",
           "results": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
