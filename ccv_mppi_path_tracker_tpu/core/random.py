"""PRNG policy.

The reference reseeds ``std::mt19937`` from ``std::random_device`` every
control cycle (src/diff_drive_mppi.cpp:83-84) — non-reproducible by
construction. The framework replaces that with explicit threaded JAX keys:

- one key per control cycle, split from the controller's carried key;
- under sample-axis sharding, each shard folds in its mesh position so the
  noise drawn on N devices is independent without any cross-device sync.
"""

from __future__ import annotations

import jax


def next_cycle_key(key):
    """Split the carried controller key into (carry, use) for this cycle."""
    return jax.random.split(key)


def shard_key(key, axis_name: str):
    """Derive a per-shard key inside shard_map by folding in the mesh index."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
