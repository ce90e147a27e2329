#!/usr/bin/env python
"""Solve-path collective/compute overlap experiment (SURVEY.md section 7:
"overlap with next-step sampling where legal"; VERDICT r3 stretch item).

The sharded MPPI cycle ends in three collectives (pmin baseline + two
psums). The only next-cycle work independent of their results is noise
generation (it depends on the carried PRNG key, not on u_opt). The
pipelined variant (scripts/multiprocess_worker.py --overlap) therefore
draws cycle n+1's standard normals INSIDE cycle n's program with no data
dependency on the collectives, leaving the scheduler free to overlap them;
the sequential arm is the production RNG-mode step. This driver runs both
arms on the 1/2/4-process ladder (gRPC + gloo across processes — the CPU
stand-in for DCN; same ladder as BENCH_DETAIL.md's multi-process section)
and commits the measured verdict to artifacts/ab_overlap.json.

BENCH_DETAIL.md's prior analysis bounds the possible win at <5% even on
DCN (the three collectives move ~582 B); this experiment replaces that
bound with a measurement either way.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiprocess_worker.py")


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_ladder_point(num_processes, devices_per_process, K, T, iters):
    import numpy as np

    port = free_port()
    outs = []
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory() as td:
        for pid in range(num_processes):
            out = os.path.join(td, f"p{pid}.npz")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, WORKER,
                 "--coordinator", f"localhost:{port}",
                 "--num-processes", str(num_processes),
                 "--process-id", str(pid),
                 "--devices-per-process", str(devices_per_process),
                 "--num-samples", str(K), "--horizon", str(T),
                 "--timing-iters", str(iters), "--overlap",
                 "--out", out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        logs = [p.communicate(timeout=1800)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{log[-2000:]}")
        d = np.load(outs[0])
        return {
            "sequential_ms": round(float(d["step_s"]) * 1e3, 1),
            "pipelined_ms": round(float(d["step_overlap_s"]) * 1e3, 1),
            "speedup_pct": round(
                100.0 * (1.0 - float(d["step_overlap_s"])
                         / max(float(d["step_s"]), 1e-12)), 1),
        }


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=131_072)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    ladder = [(1, 8), (2, 4), (4, 2)]
    results = {}
    for nproc, dpp in ladder:
        r = run_ladder_point(nproc, dpp, args.num_samples, args.horizon,
                             args.iters)
        results[f"{nproc}proc_x_{dpp}dev"] = r
        print(f"{nproc} processes: sequential {r['sequential_ms']} ms, "
              f"pipelined {r['pipelined_ms']} ms "
              f"({r['speedup_pct']:+.1f}%)", flush=True)

    out = {
        "workload": {"model": "full_body", "K": args.num_samples,
                     "T": args.horizon, "dtype": "f32",
                     "global_devices": 8, "iters": args.iters},
        "arms": {
            "sequential": "production RNG-mode sharded step (noise drawn "
                          "at cycle start, collectives at cycle end)",
            "pipelined": "cycle n solves with pre-drawn noise; cycle n+1's "
                         "normals drawn in the same program, independent of "
                         "the collectives",
        },
        "results": results,
    }
    path_out = os.path.join(REPO, "artifacts", "ab_overlap.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
