"""CLI, plots, pure-pursuit baseline."""

import os

import numpy as np
import pytest

from ccv_mppi_path_tracker_tpu.cli import main
from ccv_mppi_path_tracker_tpu.metrics.plots import (
    feasible_region_points,
    plot_feasible_region,
)
from ccv_mppi_path_tracker_tpu.paths import sum_of_cosines_course
from ccv_mppi_path_tracker_tpu.runtime.pure_pursuit import (
    PurePursuitConfig,
    run_pure_pursuit_experiment,
)


def test_cli_run_records_and_plots(tmp_path, capsys):
    rec_dir = str(tmp_path / "log")
    fig = str(tmp_path / "fig.png")
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "40",
        "--num-samples", "128", "--record", rec_dir, "--plot", fig,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMSE Error:" in out and "Max Error:" in out
    assert os.path.exists(fig)
    csvs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(rec_dir) for f in fs if f.endswith(".csv")
    ]
    assert len(csvs) == 1
    header = open(csvs[0]).readline().strip().split(",")
    assert header[:3] == ["time", "x", "y"]


def test_cli_run_path_selection(capsys):
    # default is auto (XLA on the CPU backend); --no-kernel forces XLA;
    # --kernel + --no-kernel together is an error
    rc = main(["run", "--preset", "diff_drive", "--steps", "2",
               "--num-samples", "128"])
    assert rc == 0
    assert "solver path: xla (auto)" in capsys.readouterr().out
    rc = main(["run", "--preset", "diff_drive", "--steps", "2",
               "--num-samples", "128", "--no-kernel"])
    assert rc == 0
    assert "solver path: xla\n" in capsys.readouterr().out
    # argparse mutually-exclusive group: clean usage error (works under -O
    # too, unlike a bare assert)
    with pytest.raises(SystemExit):
        main(["run", "--preset", "diff_drive", "--steps", "2",
              "--num-samples", "128", "--kernel", "--no-kernel"])


def test_cli_course(tmp_path):
    out = str(tmp_path / "c.csv")
    rc = main(["course", "--kind", "dkan", "--out", out])
    assert rc == 0
    data = np.loadtxt(out, delimiter=",", skiprows=1)
    assert data.shape[1] == 2 and len(data) > 300


def test_cli_sysid(capsys):
    rc = main(["sysid"])
    assert rc == 0
    import json

    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    np.testing.assert_allclose(res["fitted_gains"], res["true_gains"], rtol=0.01)


def test_pure_pursuit_tracks_gentle_course():
    course = sum_of_cosines_course(
        amplitudes=(1.0, 0, 0), frequencies=(0.127, 0, 0), deltas=(0, 0, 0),
        resolution=0.1, course_length=20.0,
    )
    out = run_pure_pursuit_experiment(
        course, num_steps=200, cfg=PurePursuitConfig(lookahead=0.8, v_ref=1.0)
    )
    assert out["metrics"]["rmse"] < 0.25, out["metrics"]
    assert out["logs"]["state"][-1, 0] > 10.0


def test_feasible_region_geometry():
    no_steer, steer = feasible_region_points(n=15)
    # without steering: |omega| <= 2*v_max/L at V=0
    assert np.max(np.abs(no_steer[:, 1])) <= 2 * 3.0 / 0.5 + 1e-9
    # steering expands the reachable |omega| range
    assert np.max(np.abs(steer[:, 1])) > np.max(np.abs(no_steer[:, 1]))


def test_plot_feasible_region_renders(tmp_path):
    out = str(tmp_path / "region.png")
    plot_feasible_region(out=out, n=10)
    assert os.path.getsize(out) > 1000


def test_plot_square_analysis_and_solver_debug(tmp_path):
    from ccv_mppi_path_tracker_tpu.metrics.plots import (
        plot_filtered_square_analysis,
        plot_solver_debug,
    )
    import jax
    import jax.numpy as jnp
    from ccv_mppi_path_tracker_tpu.core import ControllerState
    from ccv_mppi_path_tracker_tpu.core.presets import diff_drive_launch
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import mppi_step

    out1 = str(tmp_path / "sq.png")
    plot_filtered_square_analysis(out=out1)
    assert os.path.getsize(out1) > 1000

    cfg, sp, cp, course = diff_drive_launch(num_samples=64, horizon=10)
    path = PathBuffer.from_points(course, 0.1)
    ctrl = ControllerState.initial(jax.random.PRNGKey(0), 10, 2)
    state = jnp.asarray([0.0, float(course[0, 1]), 0.0], jnp.float32)
    _, res = mppi_step(
        cfg, ctrl, state, path, jnp.float32(0.1), sp, cp, debug_candidates=16
    )
    assert res.stats["candidates"].shape == (16, 10, 2)
    out2 = str(tmp_path / "dbg.png")
    plot_solver_debug(res, course=course, out=out2)
    assert os.path.getsize(out2) > 1000


def test_path_yaw_matches_graph3_loop():
    """path_yaw == the reference script's per-point loop (src/graph3.py:26-32)."""
    from ccv_mppi_path_tracker_tpu.metrics.plots import path_yaw

    rng = np.random.RandomState(0)
    c = np.cumsum(rng.rand(20, 2) * 0.3 + 0.05, axis=0)
    expected = []
    for i in range(len(c)):
        if i == 0:
            expected.append(np.arctan2(c[i+1, 1]-c[i, 1], c[i+1, 0]-c[i, 0]))
        elif i == len(c) - 1:
            expected.append(np.arctan2(c[i, 1]-c[i-1, 1], c[i, 0]-c[i-1, 0]))
        else:
            expected.append(np.arctan2(c[i+1, 1]-c[i-1, 1], c[i+1, 0]-c[i-1, 0]))
    np.testing.assert_allclose(path_yaw(c), expected, rtol=1e-12)


def test_cli_plot_yaw(tmp_path):
    fig = str(tmp_path / "yaw.png")
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "30",
        "--num-samples", "64", "--plot-yaw", fig,
    ])
    assert rc == 0
    assert os.path.getsize(fig) > 1000


def test_cli_fleet(capsys):
    rc = main([
        "fleet", "--preset", "diff_drive", "--steps", "20",
        "--num-samples", "128", "--robots", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "robot-updates/s" in out and "RMSE mean=" in out


def test_cli_run_dkan_course(capsys):
    """--course dkan mirrors launch/dkan_diff_drive_mppi.launch (controller
    on the corridor course)."""
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "40",
        "--num-samples", "128", "--course", "dkan",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMSE Error:" in out


def test_cli_profile(tmp_path, capsys):
    import json as _json

    out = str(tmp_path / "trace")
    rc = main([
        "profile", "--preset", "diff_drive", "--steps", "5",
        "--num-samples", "128", "--out", out,
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = _json.loads(lines[-2])
    assert "control_cycle" in summary and summary["control_cycle"]["count"] == 5
    assert os.path.isdir(out)


def test_cli_run_checkpoint_roundtrip(tmp_path, capsys):
    ck = str(tmp_path / "run.npz")
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "30",
        "--num-samples", "128", "--save-ckpt", ck,
    ])
    assert rc == 0
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "10",
        "--num-samples", "128", "--resume-ckpt", ck,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "(cycle 30)" in out


def test_cli_run_with_solver_options(capsys):
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "30",
        "--num-samples", "128", "--shift-warm-start", "--delay", "0.02",
        "--elite-frac", "0.2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMSE Error:" in out
    rmse = float(out.split("RMSE Error:")[1].split()[0])
    assert rmse < 0.5


def test_cli_run_animate(tmp_path):
    out = str(tmp_path / "run.html")
    rc = main([
        "run", "--preset", "diff_drive", "--steps", "12",
        "--num-samples", "64", "--animate", out,
        "--animate-candidates", "6",
    ])
    assert rc == 0
    html = open(out).read()
    assert "animation" in html.lower() and len(html) > 10_000


def test_comparison_overlay_plots(tmp_path):
    """Two-run overlay figures (the reference's graph2.py:37-41 /
    zmp_graph2.py comparison plots): both render from run results of
    different lengths, steered + unsteered and controlled + uncontrolled."""
    import numpy as np

    from ccv_mppi_path_tracker_tpu.core.presets import (
        diff_drive_launch,
        full_body_launch,
        steering_launch,
    )
    from ccv_mppi_path_tracker_tpu.metrics.plots import (
        plot_tracking_comparison,
        plot_zmp_comparison,
    )
    from ccv_mppi_path_tracker_tpu.models.full_body import default_params
    from ccv_mppi_path_tracker_tpu.runtime import run_tracking_experiment

    scfg, ssp, scp, course = steering_launch(num_samples=64, horizon=8)
    steered = run_tracking_experiment(scfg, ssp, scp, course, num_steps=25)
    dcfg, dsp, dcp, _ = diff_drive_launch(num_samples=64, horizon=8)
    unsteered = run_tracking_experiment(dcfg, dsp, dcp, course, num_steps=30)
    f1 = plot_tracking_comparison(
        {"With Steering Robot": steered, "Without Steering Robot": unsteered},
        out=str(tmp_path / "cmp.png"),
    )
    assert (tmp_path / "cmp.png").exists()
    assert len(f1.axes) == 3

    fcfg, fsp, fcp, fcourse = full_body_launch(num_samples=64, horizon=8,
                                               roll_off=False)
    a = run_tracking_experiment(fcfg, fsp, fcp, fcourse, num_steps=25)
    ucfg, usp, ucp, _ = full_body_launch(num_samples=64, horizon=8,
                                         roll_off=True)
    b = run_tracking_experiment(ucfg, usp, ucp, fcourse, num_steps=30)
    f2 = plot_zmp_comparison(
        {"Controlled": a, "Not Controlled": b}, default_params(np.float32),
        out=str(tmp_path / "zmp_cmp.png"),
    )
    assert (tmp_path / "zmp_cmp.png").exists()
    assert len(f2.axes) == 2
