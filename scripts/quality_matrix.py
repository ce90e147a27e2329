#!/usr/bin/env python
"""Tracking-quality matrix at the reference's own operating points.

The reference's entire quantitative evaluation is nearest-point tracking
error (Time / Max Error / RMSE, src/calc_e_rmse.py:36-49) at named operating
points — v_ref in {0.4, 1.2, 2.0} m/s (launch/full_body_mppi.launch:6,29-31;
archived PNG names in log/full_body/robo_sym/) on its courses, MPPI vs a
pure-pursuit baseline (launch/pure_pursuit.launch, src/graph2.py:37-41),
plus the controlled-vs-uncontrolled lateral-ZMP comparison at v=2.0
(log/full_body/robo_sym/{controlled,uncontrolled}.png, band +-0.15 m from
src/zmp_graph.py:53).

This script sweeps that full grid with the framework's closed-loop scan and
commits the result as artifacts/quality_matrix.json:

    controllers {diff_drive K=1000, steering K=1000, full_body K=10000}
  x courses     {cosine A=1.0 f=0.25, cosine A=1.5 f=0.127, dkan corridor,
                 filtered square wave}
  x v_ref       {0.4, 1.2, 2.0}
  each MPPI (auto solver path: fused kernel where measured faster) vs the
  pure-pursuit baseline on the same course, plus full_body ZMP
  controlled (zmp_weight=10) vs uncontrolled (roll_off) arms at v=2.0.

Each tracking cell carries two MPPI arms: "mppi" = reference semantics
(classic sampled update, the parity-tested configuration) and
"mppi_refined" = the framework's gradient-smoothed serving option
(refine_steps=3 Gauss-Newton polish through the rollout, diff/gradients.py
— a capability the serial reference cannot express).

Runs are truncated at course completion (first cycle whose nearest path
index reaches the final point within 0.5 m) so RMSE measures tracking, not
post-goal wandering — calc_e_rmse.py equally measures a recording that stops
at the goal.

    python scripts/quality_matrix.py                 # full grid (TPU ~ min)
    python scripts/quality_matrix.py --quick         # CI subset, small K
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V_REFS = (0.4, 1.2, 2.0)
DT = 0.1
COMPLETE_TOL = 0.5  # m, distance to the final course point that ends a run


def courses(dtype=np.float32):
    from ccv_mppi_path_tracker_tpu.paths.courses import (
        dkan_course,
        filtered_square_course,
        sum_of_cosines_course,
    )
    from ccv_mppi_path_tracker_tpu.paths.spline import spline_resample_course

    def cos(a, f, length):
        return sum_of_cosines_course(
            amplitudes=(a, 0.0, 0.0), frequencies=(f, 0.0, 0.0),
            deltas=(0.0, 0.0, 0.0), resolution=0.1, course_length=length,
            dtype=dtype,
        )

    return {
        # launch/diff_drive_mppi.launch:15-17 (A=1.0, f=0.25)
        "cosine_A1.0_f0.25": cos(1.0, 0.25, 10.0),
        # launch/full_body_mppi.launch:29-31 (A=1.5, f=0.127)
        "cosine_A1.5_f0.127": cos(1.5, 0.127, 20.0),
        # src/dkan_path_creator.cpp:11-35
        "dkan": dkan_course(dtype=dtype),
        # src/reference_path_creator.py:34-47 at the LAUNCH operating point
        # (launch/reference_path_creator.launch:5-11: fs=10 -> 0.1 m point
        # spacing, wave_hz=0.2, len=20, cutoff=1), not the node defaults —
        # fs=1000 would put 0.001 m spacing under the controllers' 0.1 m
        # resample resolution and freeze the reference window. The raw
        # generator samples uniformly in x, so points on the steep edges sit
        # up to ~0.8 m apart along the arc — a discretization trap for the
        # reference's min-distance-to-sampled-points cost (sitting exactly
        # on a sparse point can beat moving between points at low v_ref).
        # The spline layer (the capability the reference #includes but never
        # instantiates, paths/spline.py) resamples to true 0.1 m ARC
        # spacing, which is what the launch comment assumes.
        "filtered_square": spline_resample_course(
            filtered_square_course(
                length=20.0, amplitude=2.0, wave_hz=0.2, fs=10.0, cutoff=1.0,
            ),
            0.1,
        ).astype(dtype),
    }


def controller_configs(v_ref, quick=False, roll_off=False):
    """(cfg, sp, cp) per controller family at its launch operating point,
    with the traced v_ref swept (launch/full_body_mppi.launch:6)."""
    import dataclasses

    import jax.numpy as jnp

    from ccv_mppi_path_tracker_tpu.core.presets import (
        diff_drive_launch,
        full_body_launch,
        steering_launch,
    )

    k_dd = 256 if quick else 1000
    k_fb = 256 if quick else 10000
    out = {}
    for name, fn, k in (
        ("diff_drive", diff_drive_launch, k_dd),
        ("steering", steering_launch, k_dd),
    ):
        cfg, sp, cp, _ = fn(num_samples=k)
        cp = dataclasses.replace(cp, v_ref=jnp.float32(v_ref))
        out[name] = (cfg, sp, cp)
    # controlled by default: zmp_weight=10 active (the reference's
    # "controlled" experiments; roll_off=True is the uncontrolled arm)
    cfg, sp, cp, _ = full_body_launch(num_samples=k_fb, roll_off=roll_off)
    cp = dataclasses.replace(cp, v_ref=jnp.float32(v_ref))
    out["full_body"] = (cfg, sp, cp)
    return out


def course_length(course):
    return float(np.sum(np.hypot(*np.diff(np.asarray(course, float), axis=0).T)))


def num_steps_for(course, v_ref, quick=False):
    # 3.5x the ideal-speed time: the tighter courses (filtered square at
    # v_ref >= 1.2) force the controllers to slow well below v_ref at the
    # corners — correct behavior, not a failure to finish.
    n = int(course_length(course) / (v_ref * DT) * 3.5) + 100
    return min(n, 1000 if quick else 4600)


def truncate_at_completion(xy, course):
    """First cycle index whose nearest course point is the final one (within
    COMPLETE_TOL); returns (n_cycles_used, completed)."""
    course = np.asarray(course, float)
    end = course[-1]
    d_end = np.hypot(xy[:, 0] - end[0], xy[:, 1] - end[1])
    # the docstring's actual criterion: the NEAREST course point must be the
    # final one — proximity to the endpoint alone would truncate early on a
    # course whose early segments pass near their own endpoint (ADVICE r4)
    d2 = ((xy[:, None, :] - course[None, :, :]) ** 2).sum(-1)
    nearest_is_last = np.argmin(d2, axis=1) == len(course) - 1
    hit = np.nonzero(nearest_is_last & (d_end < COMPLETE_TOL))[0]
    if len(hit) == 0:
        return len(xy), False
    return int(hit[0]) + 1, True


# the framework's gradient-smoothed serving configuration (second MPPI arm)
REFINE_OPTS = {"refine_steps": 3, "refine_method": "gauss_newton"}


def eval_mppi(cfg, sp, cp, course, v_ref, seed=0, quick=False,
              use_kernel=False, zmp_params=None, solver_options=None):
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.runtime.loop import run_tracking_experiment

    steps = num_steps_for(course, v_ref, quick)
    out = run_tracking_experiment(
        cfg, sp, cp, course, num_steps=steps, dt=DT, seed=seed,
        use_kernel=use_kernel, solver_options=solver_options,
    )
    states = out["logs"]["state"]
    xy = np.concatenate([out["state0"][None, :2], states[:, :2]], axis=0)
    n, completed = truncate_at_completion(xy, course)
    m = tracking_metrics(xy[:n], course, dt=DT)
    cell = {
        "steps": int(n - 1), "completed": bool(completed),
        "time_s": round(m["time"], 1),
        "max_error_m": round(m["max_error"], 4),
        "rmse_m": round(m["rmse"], 4),
    }
    if zmp_params is not None:
        from ccv_mppi_path_tracker_tpu.models.full_body import zmp_chain

        full_states = np.concatenate([out["state0"][None], states], axis=0)
        zmp = np.asarray(
            zmp_chain(full_states[:n], out["logs"]["u0"][: n - 1], DT,
                      zmp_params)
        )
        # settle-skip like tests/test_full_stack_sim.py (start transient)
        z = np.abs(zmp[5:, 1]) if len(zmp) > 10 else np.abs(zmp[:, 1])
        cell["zmp_y_max_m"] = round(float(z.max()), 4)
        cell["zmp_y_rms_m"] = round(float(np.sqrt(np.mean(z ** 2))), 4)
    return cell


def eval_mppi_seeds(cfg, sp, cp, course, v_ref, seeds=(0, 1, 2), **kw):
    """Seed-averaged MPPI cell: MPPI is a stochastic controller, so marginal
    cells flip run-to-run on sampling noise; the committed matrix reports
    the mean over ``seeds`` (per-seed RMSEs kept for spread)."""
    runs = [eval_mppi(cfg, sp, cp, course, v_ref, seed=s, **kw)
            for s in seeds]
    cell = {
        "seeds": list(seeds),
        "steps": int(np.mean([r["steps"] for r in runs])),
        "completed": all(r["completed"] for r in runs),
        "time_s": round(float(np.mean([r["time_s"] for r in runs])), 1),
        "max_error_m": round(
            float(np.mean([r["max_error_m"] for r in runs])), 4),
        "rmse_m": round(float(np.mean([r["rmse_m"] for r in runs])), 4),
        "rmse_per_seed": [r["rmse_m"] for r in runs],
    }
    if "zmp_y_max_m" in runs[0]:
        cell["zmp_y_max_m"] = round(
            float(np.mean([r["zmp_y_max_m"] for r in runs])), 4)
        cell["zmp_y_rms_m"] = round(
            float(np.mean([r["zmp_y_rms_m"] for r in runs])), 4)
    return cell


def eval_pure_pursuit(course, v_ref, quick=False):
    from ccv_mppi_path_tracker_tpu.metrics.tracking import tracking_metrics
    from ccv_mppi_path_tracker_tpu.runtime.pure_pursuit import (
        PurePursuitConfig,
        run_pure_pursuit_experiment,
    )

    steps = num_steps_for(course, v_ref, quick)
    # lookahead scales with speed (standard tuning; 0.8 m floor)
    cfg = PurePursuitConfig(
        lookahead=max(0.8, 0.65 * v_ref), v_ref=v_ref, w_max=2.0
    )
    out = run_pure_pursuit_experiment(course, num_steps=steps, dt=DT, cfg=cfg)
    xy = np.concatenate(
        [np.asarray(course[:1], np.float64),
         out["logs"]["state"][:, :2]], axis=0,
    )
    n, completed = truncate_at_completion(xy, course)
    m = tracking_metrics(xy[:n], course, dt=DT)
    return {
        "steps": int(n - 1), "completed": bool(completed),
        "lookahead_m": round(cfg.lookahead, 2),
        "time_s": round(m["time"], 1),
        "max_error_m": round(m["max_error"], 4),
        "rmse_m": round(m["rmse"], 4),
    }


def run_matrix(quick=False, kernel_mode="auto"):
    import jax

    from ccv_mppi_path_tracker_tpu.kernels import should_use_kernel
    from ccv_mppi_path_tracker_tpu.models.full_body import default_params

    zmp_params = default_params(np.float32)
    cells = []
    pp_cache = {}
    for course_name, course in courses().items():
        for v_ref in V_REFS:
            key = (course_name, v_ref)
            if key not in pp_cache:
                pp_cache[key] = eval_pure_pursuit(course, v_ref, quick)
            pp = pp_cache[key]
            for ctrl_name, (cfg, sp, cp) in controller_configs(
                v_ref, quick
            ).items():
                if kernel_mode == "auto":
                    uk = should_use_kernel(
                        cfg.num_samples, cfg.horizon, model=cfg.model
                    )
                else:
                    uk = kernel_mode == "kernel"
                zp = zmp_params if ctrl_name == "full_body" else None
                seeds = (0,) if quick else (0, 1, 2)
                cell = eval_mppi_seeds(
                    cfg, sp, cp, course, v_ref, seeds=seeds, quick=quick,
                    use_kernel=uk, zmp_params=zp,
                )
                refined = eval_mppi_seeds(
                    cfg, sp, cp, course, v_ref, seeds=seeds, quick=quick,
                    use_kernel=uk, zmp_params=zp,
                    solver_options=dict(REFINE_OPTS),
                )
                best = min(cell["rmse_m"], refined["rmse_m"])
                cell.update(
                    controller=ctrl_name, course=course_name, v_ref=v_ref,
                    K=cfg.num_samples, solver_path="kernel" if uk else "xla",
                    mppi_refined=refined, refine_opts=REFINE_OPTS,
                    pure_pursuit=pp,
                    mppi_beats_pp=bool(cell["rmse_m"] <= pp["rmse_m"]),
                    framework_beats_pp=bool(best <= pp["rmse_m"]),
                )
                cells.append(cell)
                print(
                    f"{course_name:>20} v={v_ref:<4} {ctrl_name:>10} "
                    f"[{cell['solver_path']}] rmse={cell['rmse_m']:.3f} "
                    f"refined={refined['rmse_m']:.3f} "
                    f"max={cell['max_error_m']:.3f} "
                    f"(pp rmse={pp['rmse_m']:.3f}) "
                    f"{'OK' if cell['framework_beats_pp'] else 'LOSS'}"
                    f"{'' if cell['mppi_beats_pp'] else ' (vanilla loss)'}",
                    flush=True,
                )

        # controlled-vs-uncontrolled lateral ZMP at v=2.0 (the reference's
        # log/full_body/robo_sym/{controlled,uncontrolled}.png experiment)
        v = 2.0
        arms = {}
        for arm, roll_off in (("controlled", False), ("uncontrolled", True)):
            cfg, sp, cp = controller_configs(v, quick, roll_off=roll_off)[
                "full_body"
            ]
            uk = (
                should_use_kernel(cfg.num_samples, cfg.horizon, model=cfg.model)
                if kernel_mode == "auto" else kernel_mode == "kernel"
            )
            arms[arm] = eval_mppi(
                cfg, sp, cp, course, v, quick=quick, use_kernel=uk,
                zmp_params=zmp_params,
            )
        cells.append({
            "controller": "full_body", "course": course_name,
            "v_ref": v, "experiment": "zmp_controlled_vs_uncontrolled",
            "controlled": arms["controlled"],
            "uncontrolled": arms["uncontrolled"],
            "zmp_reduction_pct": round(
                100.0 * (1.0 - arms["controlled"]["zmp_y_max_m"]
                         / max(arms["uncontrolled"]["zmp_y_max_m"], 1e-9)), 1,
            ),
            "zmp_rms_reduction_pct": round(
                100.0 * (1.0 - arms["controlled"]["zmp_y_rms_m"]
                         / max(arms["uncontrolled"]["zmp_y_rms_m"], 1e-9)), 1,
            ),
            "zmp_band_held": bool(arms["controlled"]["zmp_y_max_m"] < 0.15),
        })
        if (cells[-1]["zmp_reduction_pct"] < 0
                and cells[-1]["zmp_rms_reduction_pct"] > 0):
            # seen on the dkan corridor: the quadratic ZMP objective
            # (sum of zmp_y^2, the reference's own cost design,
            # src/full_body_mppi.cpp:414) minimizes the MEAN square, not
            # the max — at the corridor's 90-degree corner the controlled
            # arm's active counter-roll reverses roll rate, and the
            # finite-difference H_G term spikes for ~2 cycles (diagnosed:
            # both arms' global max lands at the corner near waypoint
            # (17.7, 8.0); the controlled transient is brief while its
            # steady-state |zmp| is roughly halved). Band still held.
            cells[-1]["controlled_max_note"] = (
                "controlled max|zmp_y| exceeds uncontrolled: a brief "
                "roll-rate-reversal transient at the corridor corner "
                "(Hdot_G finite difference), the optimal trade under the "
                "quadratic (mean-square) zmp cost that halves RMS; "
                "max|zmp| is not in the objective"
            )
        print(
            f"{course_name:>20} v=2.0  zmp ctrl/unctrl max "
            f"{arms['controlled']['zmp_y_max_m']:.3f}/"
            f"{arms['uncontrolled']['zmp_y_max_m']:.3f} "
            f"band={'held' if cells[-1]['zmp_band_held'] else 'EXCEEDED'}",
            flush=True,
        )

    dev = jax.devices()[0]
    return {
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "dt": DT, "quick": quick, "kernel_mode": kernel_mode,
        "complete_tol_m": COMPLETE_TOL,
        "v_refs": list(V_REFS),
        "metric": "nearest-point tracking error (src/calc_e_rmse.py:36-49)",
        "cells": cells,
        "summary": summarize(cells),
    }


def summarize(cells):
    track = [c for c in cells if "experiment" not in c]
    zmp = [c for c in cells if c.get("experiment")]
    losses = [
        f"{c['controller']}/{c['course']}/v={c['v_ref']}"
        for c in track if not c["framework_beats_pp"]
    ]
    return {
        "tracking_cells": len(track),
        "vanilla_mppi_wins": sum(c["mppi_beats_pp"] for c in track),
        "framework_wins": sum(c["framework_beats_pp"] for c in track),
        "framework_losses": losses,
        # cells where a controller did not reach the course end inside the
        # step budget (it keeps progressing, slowed far below v_ref at the
        # sharp filtered-square corners — RMSE/max there cover the distance
        # actually traversed; the Time column shows the slowdown)
        "incomplete_cells": sorted({
            f"{c['controller']}/{c['course']}/v={c['v_ref']}"
            for c in track
            if not (c["completed"] and c["mppi_refined"]["completed"])
        }),
        "zmp_experiments": len(zmp),
        # peak OR rms lateral ZMP reduced by the controller on every course
        "zmp_all_reduced": all(
            c["zmp_reduction_pct"] > 0 or c["zmp_rms_reduction_pct"] > 0
            for c in zmp
        ),
        # the reference's own band experiment ran on its cosine course
        # (log/full_body/robo_sym); the +-0.15 m gate applies there.
        "zmp_band_held_ref_course": all(
            c["zmp_band_held"] for c in zmp
            if c["course"] == "cosine_A1.5_f0.127"
        ),
        "zmp_band_held_by_course": {
            c["course"]: c["zmp_band_held"] for c in zmp
        },
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small K + capped steps (CI smoke)")
    p.add_argument("--kernel", choices=("auto", "kernel", "xla"),
                   default="auto")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (the env var alone is "
                        "overridden by the site's TPU tunnel registration)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "quality_matrix.json"))
    args = p.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    out = run_matrix(quick=args.quick, kernel_mode=args.kernel)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {args.out}")
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
