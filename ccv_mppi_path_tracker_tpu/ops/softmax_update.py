"""Softmax importance weights and the weighted control update.

Reference semantics (calc_Weights, src/diff_drive_mppi.cpp:212-223):
``w_i = exp(-cost_i / lambda) / sum_j exp(-cost_j / lambda)`` with NO
baseline subtraction — which underflows to all-zero weights (0/0) once costs
exceed ~700*lambda. This implementation subtracts the minimum cost before
exponentiating, which is mathematically identical whenever the reference is
finite and stays well-posed when it is not (documented divergence; the parity
suite uses cost scales where both are finite).

Under sample-axis sharding the baseline is a ``pmin`` and both reductions are
``psum`` over the mesh axis — this pair of collectives is the entire
communication pattern of distributed MPPI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def elite_threshold(
    costs: jax.Array,
    frac: float,
    axis_name: Optional[str] = None,
    iters: int = 64,
):
    """Global cost threshold selecting the best ``frac`` of ALL samples.

    Returns the (approximately) ``ceil(frac * K_global)``-th smallest cost,
    found by value bisection bracketed by the global min/max. Every reduction
    is exact (pmin/pmax of the bracket, psum of integer counts), so the
    bisection iterates are bit-identical whether ``costs`` is the full vector
    on one device or a shard under ``axis_name`` — sharded elite selection
    therefore matches single-device exactly. 64 halvings shrink the bracket
    by 2^64, far below one ulp of any realistic cost scale, so the returned
    threshold separates the k-th and (k+1)-th order statistics exactly.
    """
    k_local = costs.shape[0]
    n_shards = 1
    if axis_name is not None:
        n_shards = jax.lax.axis_size(axis_name)
    target = max(1, int(round(frac * k_local * n_shards)))

    lo = jnp.min(costs)
    hi = jnp.max(costs)
    if axis_name is not None:
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        count = jnp.sum((costs <= mid).astype(jnp.int32))
        if axis_name is not None:
            count = jax.lax.psum(count, axis_name)
        keep = count >= target
        # invariant: count(<= hi) >= target always holds
        return jnp.where(keep, lo, mid), jnp.where(keep, mid, hi)

    _, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def softmax_weights(
    costs: jax.Array,
    lam,
    axis_name: Optional[str] = None,
    elite_frac: Optional[float] = None,
):
    """Globally-normalized importance weights from per-sample costs.

    costs: (K_local,). Returns (weights (K_local,), stats dict). When
    ``axis_name`` is given the normalization spans all shards, so
    concatenating per-shard weights yields the global softmax.

    elite_frac: optional CEM<->MPPI interpolation — zero the weight of every
        sample whose cost is above the global ``elite_frac`` rank threshold
        (:func:`elite_threshold`) before normalizing; elite_frac=1.0 is
        exactly vanilla MPPI. Works sharded: the threshold bisection spans
        all shards and matches single-device bit-exactly. The threshold is
        reported in stats["elite_thresh"].
    """
    baseline = jnp.min(costs)
    if axis_name is not None:
        baseline = jax.lax.pmin(baseline, axis_name)
    unnorm = jnp.exp(-(costs - baseline) / lam)
    thresh = None
    if elite_frac is not None:
        thresh = elite_threshold(costs, elite_frac, axis_name=axis_name)
        unnorm = jnp.where(costs <= thresh, unnorm, 0.0)
    denom = jnp.sum(unnorm)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    weights = unnorm / denom

    sum_w2 = jnp.sum(weights * weights)
    mean_cost = jnp.sum(costs)
    if axis_name is not None:
        sum_w2 = jax.lax.psum(sum_w2, axis_name)
        mean_cost = jax.lax.psum(mean_cost, axis_name)
        k_total = costs.shape[0] * jax.lax.axis_size(axis_name)
    else:
        k_total = costs.shape[0]
    stats = {
        "min_cost": baseline,
        "mean_cost": mean_cost / k_total,
        # Effective sample size of the importance weights, in [1, K].
        "ess": 1.0 / sum_w2,
    }
    if thresh is not None:
        stats["elite_thresh"] = thresh
    return weights, stats


def weighted_update(
    weights: jax.Array, samples: jax.Array, axis_name: Optional[str] = None
):
    """New optimal sequence = importance-weighted average of the samples.

    weights: (K,) globally normalized; samples: (T-1, K, U).
    Returns (T-1, U) (reference determine_OptimalSolution,
    src/diff_drive_mppi.cpp:225-246). The contraction over K is a matmul that
    XLA places on the MXU for large K.
    """
    u = jnp.einsum(
        "k,tku->tu", weights, samples, preferred_element_type=samples.dtype
    )
    if axis_name is not None:
        u = jax.lax.psum(u, axis_name)
    return u
