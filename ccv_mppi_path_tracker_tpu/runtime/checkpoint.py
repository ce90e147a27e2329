"""Checkpoint / resume.

The reference has no persistence (SURVEY.md section 5); the controller state
that matters is tiny — the warm-start sequence, PRNG key, cycle counter, and
the numeric parameter pytrees. Saved as a flat .npz so restart is
deterministic from config + last control sequence.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ccv_mppi_path_tracker_tpu.core.config import SolverConfig
from ccv_mppi_path_tracker_tpu.core.types import ControllerState


def save_checkpoint(path: str, cfg: SolverConfig, ctrl: ControllerState, **pytrees):
    """Persist controller state (+ any named pytrees, e.g. sp=, cp=)."""
    flat = {
        "ctrl/u_prev": np.asarray(ctrl.u_prev),
        "ctrl/key": np.asarray(jax.random.key_data(ctrl.key))
        if jax.dtypes.issubdtype(ctrl.key.dtype, jax.dtypes.prng_key)
        else np.asarray(ctrl.key),
        "ctrl/step": np.asarray(ctrl.step),
    }
    treedefs = {}
    for name, tree in pytrees.items():
        leaves, treedef = jax.tree.flatten(tree)
        treedefs[name] = str(treedef)
        for i, leaf in enumerate(leaves):
            flat[f"{name}/{i}"] = np.asarray(leaf)
    flat["__config__"] = np.frombuffer(
        json.dumps(
            {
                "model": cfg.model,
                "num_samples": cfg.num_samples,
                "horizon": cfg.horizon,
                "steer_off": cfg.steer_off,
                "pytrees": {k: _num_leaves(v) for k, v in pytrees.items()},
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **flat)


def _num_leaves(tree):
    return len(jax.tree.leaves(tree))


def load_checkpoint(path: str, **pytree_templates):
    """Restore (cfg, ctrl, pytrees). Templates give back the tree structure:
    ``load_checkpoint(p, sp=sp_template)`` rebuilds sp with saved leaves."""
    data = np.load(path)
    meta = json.loads(bytes(data["__config__"]).decode())
    cfg = SolverConfig(
        model=meta["model"],
        num_samples=meta["num_samples"],
        horizon=meta["horizon"],
        steer_off=meta["steer_off"],
    )
    key = data["ctrl/key"]
    if key.dtype == np.uint32 and key.shape == (2,):
        key = jax.random.wrap_key_data(key)
    ctrl = ControllerState(
        u_prev=data["ctrl/u_prev"], key=key, step=data["ctrl/step"]
    )
    out = {}
    for name, template in pytree_templates.items():
        n = meta["pytrees"][name]
        leaves = [data[f"{name}/{i}"] for i in range(n)]
        out[name] = jax.tree.unflatten(jax.tree.structure(template), leaves)
    return cfg, ctrl, out
