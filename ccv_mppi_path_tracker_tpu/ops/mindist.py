"""Nearest-reference-point distance for the path-tracking cost.

The reference scans all T local reference points for every rollout state —
an O(K*T^2) triple loop (calc_MinDistance, src/diff_drive_mppi.cpp:183-192)
capped by initializing ``min_distance = 100.0`` (:185).

TPU formulation: never materialize the (T, K, T_ref) distance tensor
(360 MB at K=100k, T=30). Instead scan over the T_ref reference points with a
running elementwise minimum of *squared* distances — memory stays at one
(T, K) buffer, the reduction is pure VPU work, and the sqrt disappears
(min and square commute for non-negative distances; the 100.0 cap becomes a
1e4 cap on the square, bit-identical semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# min_distance initialization in the reference (src/diff_drive_mppi.cpp:185):
# distances are effectively capped at 100.0 m.
DIST_CAP = 100.0


def min_sq_distance(xy: jax.Array, ref_xy: jax.Array) -> jax.Array:
    """Min over reference points of squared distance, capped at DIST_CAP^2.

    xy: (..., 2) rollout positions; ref_xy: (R, 2) reference points.
    Returns (...,) = min(DIST_CAP^2, min_j |xy - ref_j|^2).
    """
    cap = jnp.asarray(DIST_CAP * DIST_CAP, xy.dtype)
    # Derive the carry from xy (0*xy + cap) instead of jnp.full: under
    # shard_map the carry must inherit xy's device-varying type or the scan
    # carry types mismatch.
    init = xy[..., 0] * 0.0 + cap

    def body(carry, ref_pt):
        dx = xy[..., 0] - ref_pt[0]
        dy = xy[..., 1] - ref_pt[1]
        return jnp.minimum(carry, dx * dx + dy * dy), None

    out, _ = jax.lax.scan(body, init, ref_xy)
    return out
