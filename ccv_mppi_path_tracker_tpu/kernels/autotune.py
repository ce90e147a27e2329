"""Device-aware ``use_kernel="auto"`` crossover policy.

The propagations-per-update crossovers in rollout_cost.py were measured on a
TPU v5e (BENCH_DETAIL.md); on any other TPU generation those literals are
guesses. ``resolve_auto`` therefore keys the measured table by
``jax.devices()[0].device_kind`` and, for unknown kinds, falls back to a
one-shot on-device micro-calibration: time one fused-kernel solve and one
XLA-pipeline solve at the requested (model, K, T) and cache the verdict on
disk next to the XLA compile cache (``.jax_cache/kernel_autocal.json``), so
the cost is paid once per (device, config). Calibration failures fall back
to the v5e table — a conservative default: a wrong "xla" pick costs up to
the measured ~10x at flagship K, a wrong "kernel" pick at most ~2.7x at
small K, and the v5e thresholds sit where "kernel" only wins big workloads.

Timing method: steps are chained through the ControllerState (a real data
dependency) and completion is forced with a scalar fetch — naive
``block_until_ready`` timing undershoots through this container's device
relay (see bench.py docstring).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from typing import Callable, Optional

import jax

logger = logging.getLogger(__name__)

# Opt-out for latency-sensitive construction on unknown TPU kinds: the
# micro-calibration synchronously compiles+times two solver configurations
# (remote compiles here can stall for minutes). With this env var set the
# verdict falls straight back to the v5e table.
_SKIP_ENV = "CCV_MPPI_NO_AUTOCAL"

_code_fingerprint_cache = None


def code_fingerprint() -> str:
    """Short hash over the crossover-relevant sources (kernel + solver +
    ops) plus the package version. Part of the calibration cache key so a
    verdict measured against an older kernel/XLA pipeline is invalidated by
    the next code change instead of pinning "auto" to a stale path
    (ADVICE r3)."""
    global _code_fingerprint_cache
    if _code_fingerprint_cache is not None:
        return _code_fingerprint_cache
    import ccv_mppi_path_tracker_tpu as pkg

    root = os.path.dirname(os.path.abspath(pkg.__file__))
    h = hashlib.sha256(getattr(pkg, "__version__", "?").encode())
    for rel in (
        "kernels/rollout_cost.py",
        "solver/mppi.py",
        "ops/rollout.py",
        "ops/sampling.py",
        "ops/costs.py",
        "ops/mindist.py",
        "ops/softmax_update.py",
    ):
        try:
            with open(os.path.join(root, rel), "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    _code_fingerprint_cache = h.hexdigest()[:12]
    return _code_fingerprint_cache

def _v5e_table() -> dict:
    # single source of truth for the v5e literals lives in rollout_cost.py
    from ccv_mppi_path_tracker_tpu.kernels.rollout_cost import (
        KERNEL_MIN_PROPS,
        KERNEL_MIN_PROPS_BY_MODEL,
    )

    return {None: KERNEL_MIN_PROPS, **KERNEL_MIN_PROPS_BY_MODEL}


# Crossover tables measured on real hardware: props = K * (T-1) per update,
# kernel wins at or above the threshold. None key = default for models
# without their own measurement. v5e numbers: BENCH_DETAIL.md.
MEASURED_MIN_PROPS = {
    "TPU v5 lite": _v5e_table,
}
_FALLBACK_KIND = "TPU v5 lite"


def table_verdict(kind: str, model: Optional[str], num_samples: int,
                  horizon: int) -> Optional[bool]:
    """Measured-table decision, or None if this device kind has no table."""
    table = MEASURED_MIN_PROPS.get(kind)
    if table is None:
        return None
    table = table()
    min_props = table.get(model, table[None])
    return num_samples * (horizon - 1) >= min_props


def _default_cache_file() -> str:
    from ccv_mppi_path_tracker_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    return os.path.join(enable_compile_cache(), "kernel_autocal.json")


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def resolve_auto(num_samples: int, horizon: int, model: Optional[str],
                 kind: Optional[str] = None,
                 measure: Optional[Callable] = None,
                 cache_file: Optional[str] = None) -> bool:
    """use_kernel verdict for a TPU backend: measured table if the device
    kind has one, else the cached/run micro-calibration."""
    if kind is None:
        kind = jax.devices()[0].device_kind
    verdict = table_verdict(kind, model, num_samples, horizon)
    if verdict is not None:
        return verdict
    return calibrated_verdict(kind, model, num_samples, horizon,
                              measure=measure, cache_file=cache_file)


def calibrated_verdict(kind: str, model: Optional[str], num_samples: int,
                       horizon: int, measure: Optional[Callable] = None,
                       cache_file: Optional[str] = None) -> bool:
    """Disk-cached kernel-vs-XLA micro-benchmark at this exact config."""
    if cache_file is None:
        cache_file = _default_cache_file()
    # the code fingerprint invalidates verdicts measured on older code
    key = f"{kind}|{model}|{num_samples}|{horizon}|{code_fingerprint()}"
    cache = _load(cache_file)
    if key in cache:
        return bool(cache[key])
    if os.environ.get(_SKIP_ENV):
        logger.info(
            "%s set: skipping kernel auto-calibration for %s, using the "
            "v5e crossover table", _SKIP_ENV, key,
        )
        return bool(
            table_verdict(_FALLBACK_KIND, model, num_samples, horizon)
        )
    if measure is None:
        measure = measure_crossover
    try:
        verdict = bool(measure(model, num_samples, horizon))
    except Exception as e:
        # never let auto-selection break a solve on exotic hardware — but
        # say why the calibration was abandoned (ADVICE r3)
        logger.warning(
            "kernel auto-calibration failed for %s (%s: %s); falling back "
            "to the v5e crossover table. Set %s=1 to skip calibration, or "
            "pass use_kernel explicitly.",
            key, type(e).__name__, e, _SKIP_ENV,
        )
        return bool(
            table_verdict(_FALLBACK_KIND, model, num_samples, horizon)
        )
    cache[key] = verdict
    try:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        with open(cache_file, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return verdict


def _steps_ms(solver, sp, cp, path, state, n: int = 6) -> float:
    import jax.numpy as jnp

    dt = jnp.float32(0.1)
    ctrl = solver.init(0)
    ctrl, res = solver.step(ctrl, state, path, dt, sp, cp)  # compile + warm
    _ = float(res.u0[0])
    t0 = time.perf_counter()
    for _ in range(n):
        ctrl, res = solver.step(ctrl, state, path, dt, sp, cp)
    _ = float(res.u0[0])  # scalar fetch forces the whole chain to complete
    return (time.perf_counter() - t0) * 1000.0 / n


def measure_crossover(model: Optional[str], num_samples: int,
                      horizon: int) -> bool:
    """True iff the fused kernel beats the XLA pipeline at this config on
    the current default device (min over 3 interleaved reps per arm)."""
    import jax.numpy as jnp
    import numpy as np

    from ccv_mppi_path_tracker_tpu.core.presets import (
        diff_drive_launch,
        full_body_launch,
        rate_limited_launch,
        steering_launch,
    )
    from ccv_mppi_path_tracker_tpu.paths import PathBuffer
    from ccv_mppi_path_tracker_tpu.solver import MPPISolver

    launch = {
        "unicycle": diff_drive_launch,
        "steering_unicycle": steering_launch,
        "rate_limited_steering": rate_limited_launch,
        "full_body": full_body_launch,
    }.get(model, diff_drive_launch)
    cfg, sp, cp, course = launch(num_samples=num_samples, horizon=horizon)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float32)
    state = jnp.zeros(cfg.num_states, jnp.float32).at[1].set(
        float(course[0, 1])
    )
    kern = MPPISolver(cfg, use_kernel=True)
    xla = MPPISolver(cfg, use_kernel=False)
    # interleave the arms: service load drifts on the ~minute scale here
    k_ms, x_ms = [], []
    for _ in range(3):
        k_ms.append(_steps_ms(kern, sp, cp, path, state))
        x_ms.append(_steps_ms(xla, sp, cp, path, state))
    return min(k_ms) < min(x_ms)
