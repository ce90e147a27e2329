#!/usr/bin/env python
"""Reproduce the quantified learned-sampler / learned-optimizer claims.

COVERAGE.md cites two numbers: the learned sampling distribution's cold-start
cost improvement (diff/learned_sampler.py) and the meta-trained update rule's
realized-cost reduction at equal sample budget (diff/learned_optimizer.py).
This script regenerates both from fixed seeds and prints one JSON object —
the committed provenance for those claims (VERDICT r1 weak#6).

    python scripts/learning_eval.py            # CPU, ~2-4 min

Both studies evaluate on HELD-OUT randomized poses (seeds disjoint from
training).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def eval_sampler(trials: int = 24):
    """Cold-start min-cost: zero-centered sampling vs the learned proposal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
    from ccv_mppi_path_tracker_tpu.diff import (
        collect_imitation_data,
        fit_sampler,
        proposal_mean,
    )
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    cfg, sp, cp, course = diff_drive_launch(num_samples=256, horizon=10)
    feats, targets = collect_imitation_data(
        cfg, sp, cp, course, jax.random.PRNGKey(0), num_states=96,
        solve_cycles=6,
    )
    net, losses = fit_sampler(
        feats, targets, jax.random.PRNGKey(1), hidden=32, num_steps=300
    )

    path = PathBuffer.from_points(course, 0.1)
    dt = jnp.float32(0.1)
    rng = np.random.RandomState(7)  # held out from the training keys
    cold_costs, warm_costs = [], []
    for i in range(trials):
        j = rng.randint(0, len(course) - 2)
        yaw0 = np.arctan2(course[j + 1, 1] - course[j, 1],
                          course[j + 1, 0] - course[j, 0])
        state = jnp.asarray([
            course[j, 0], course[j, 1] + rng.randn() * 0.3,
            yaw0 + rng.randn() * 0.3,
        ], jnp.float32)
        ref = resample_reference(path, state[:2], cp.v_ref, dt, cfg.horizon)
        u_net = jnp.clip(proposal_mean(net, cfg, state, ref), sp.u_min, sp.u_max)

        def first_cost(u_prev, seed):
            ctrl = ControllerState(
                u_prev=u_prev, key=jax.random.PRNGKey(seed),
                step=jnp.zeros((), jnp.int32),
            )
            _, res = mppi_step(cfg, ctrl, state, path, dt, sp, cp)
            return float(res.stats["min_cost"])

        cold_costs.append(first_cost(jnp.zeros_like(u_net), 100 + i))
        warm_costs.append(first_cost(u_net, 100 + i))

    cold = float(np.mean(cold_costs))
    warm = float(np.mean(warm_costs))
    return {
        "train_seed": 0,
        "fit_seed": 1,
        "eval_seed": 7,
        "trials": trials,
        "imitation_loss_first": float(losses[0]),
        "imitation_loss_last": float(losses[-1]),
        "cold_start_mean_min_cost": round(cold, 4),
        "learned_proposal_mean_min_cost": round(warm, 4),
        "cold_start_cost_ratio": round(cold / warm, 3),
        "wins": int(sum(w <= c for w, c in zip(warm_costs, cold_costs))),
    }


def eval_l2o():
    """Meta-trained update rule vs vanilla at equal sample/iteration budget."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
    from ccv_mppi_path_tracker_tpu.diff import evaluate_rule, meta_train

    cfg, sp, cp, course = diff_drive_launch(num_samples=64, horizon=8)
    rule, losses = meta_train(
        cfg, sp, cp, course, jax.random.PRNGKey(0),
        num_steps=120, batch=32, iterations=2,
    )
    held_out = jax.random.PRNGKey(1234)
    vanilla = float(evaluate_rule(cfg, None, sp, cp, course, held_out,
                                  iterations=2))
    learned = float(evaluate_rule(cfg, rule, sp, cp, course, held_out,
                                  iterations=2))
    return {
        "train_seed": 0,
        "eval_seed": 1234,
        "meta_loss_first": float(losses[0]),
        "meta_loss_last": float(losses[-1]),
        "vanilla_realized_cost": round(vanilla, 4),
        "learned_realized_cost": round(learned, 4),
        "cost_reduction_pct": round(100.0 * (1.0 - learned / vanilla), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=24)
    args = p.parse_args()
    out = {
        "learned_sampler": eval_sampler(args.trials),
        "learned_optimizer": eval_l2o(),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
