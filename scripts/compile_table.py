#!/usr/bin/env python
"""Cold/warm compile-time table for the flagship solver configs.

Each (config, path) is compiled AOT (jit(...).lower(...).compile()) in a
FRESH subprocess twice: the first run with that program absent from
.jax_cache is the true cold compile (trace + remote XLA/Mosaic compile +
cache write), the second is the warm path (trace + persistent-cache load).
Writes artifacts/compile_table.json and a markdown table to stdout.

Context: round 2 recorded a 141 s "cold compile" at the flagship config;
round 3 (a) replaced the fully-unrolled distance scan with a chunked loop
(kernels/rollout_cost.py) and (b) made bench.py time compilation AOT so a
wedged first EXECUTION through the relay can no longer masquerade as
compile time. Residual multi-minute outliers are the container's
remote-compile service wedging on the first program after idle
(observed 63-967 s for programs that recompile in 3-7 s immediately after),
not program size.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
os.environ["JAX_COMPILATION_CACHE_DIR"] = %(cache)r
import functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, %(repo)r)
from ccv_mppi_path_tracker_tpu.core import ControllerState
from ccv_mppi_path_tracker_tpu.core.presets import full_body_launch
from ccv_mppi_path_tracker_tpu.models import get_model
from ccv_mppi_path_tracker_tpu.paths import PathBuffer
from ccv_mppi_path_tracker_tpu.solver import mppi_step

K, T, use_kernel = %(k)d, %(t)d, %(kernel)r
cfg, sp, cp, course = full_body_launch(num_samples=K, horizon=T)
model = get_model(cfg.model)
path = PathBuffer.from_points(course, 0.1)
state = jnp.zeros(model.num_states, jnp.float32).at[1].set(float(course[0, 1]))
step = jax.jit(functools.partial(mppi_step, cfg, use_kernel=use_kernel,
                                 lean=True), donate_argnums=(0,))
ctrl = ControllerState.initial(jax.random.PRNGKey(0), T, model.num_controls)
t0 = time.perf_counter()
step.lower(ctrl, state, path, jnp.float32(0.1), sp, cp).compile()
print("COMPILE_S", time.perf_counter() - t0)
"""


def measure(k, t, kernel, cache):
    code = CHILD % {"repo": REPO, "k": k, "t": t, "kernel": kernel,
                    "cache": cache}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("COMPILE_S"):
            return float(line.split()[1])
    raise RuntimeError(r.stdout + r.stderr)


def main():
    import tempfile

    configs = [
        (102_400, 30, True), (102_400, 30, False),
        (1_048_576, 30, True), (102_400, 100, True),
    ]
    rows = []
    for k, t, kern in configs:
        # fresh cache dir per config: the repo .jax_cache already holds the
        # production programs, which would fake the cold measurement
        cache = tempfile.mkdtemp(prefix="coldcache_")
        cold = measure(k, t, kern, cache)
        warm = measure(k, t, kern, cache)
        rows.append({"K": k, "T": t, "path": "kernel" if kern else "xla",
                     "cold_s": round(cold, 1), "warm_s": round(warm, 1)})
        print(f"K={k} T={t} {'kernel' if kern else 'xla'}: "
              f"cold {cold:.1f}s warm {warm:.1f}s", flush=True)
    out = os.path.join(REPO, "artifacts", "compile_table.json")
    with open(out, "w") as f:
        json.dump({"note": "cold = program absent from .jax_cache (includes "
                           "remote compile + cache write); warm = "
                           "persistent-cache hit in a fresh process",
                   "rows": rows}, f, indent=1)
    print("| K | T | path | cold s | warm s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['K']} | {r['T']} | {r['path']} | {r['cold_s']} "
              f"| {r['warm_s']} |")


if __name__ == "__main__":
    main()
