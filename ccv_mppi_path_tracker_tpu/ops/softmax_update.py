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
):
    """Global cost threshold selecting the best ``frac`` of ALL samples.

    Returns EXACTLY the ``round(frac * K_global)``-th smallest cost, found
    by radix select over the order-preserving unsigned-integer transform of
    the float bits (sign bit flipped for non-negatives, all bits flipped for
    negatives — so unsigned key order == float order). Each round
    histograms one 8-bit digit of the keys still in contention and descends
    into the bucket containing the target rank. Every reduction is an exact
    integer psum, so the sharded selection is bit-identical to
    single-device — and the whole selection costs ceil(nbits/8) collective
    rounds (4 for f32, 8 for f64) versus the 64 sequential psum rounds of
    the value-bisection it replaces: at DCN latencies the collectives, not
    the flops, bound the sharded elite step.
    """
    k_local = costs.shape[0]
    n_shards = 1
    if axis_name is not None:
        n_shards = jax.lax.axis_size(axis_name)
    target = max(1, int(round(frac * k_local * n_shards)))

    if axis_name is None:
        # Single device: exact k-th smallest via sort. XLA's TPU sort beats
        # the digit-histogram rounds ~4-15x (measured on v5e: K=102400
        # 1.1 ms vs 4.6, K=1M 2.5 ms vs 37.6 — `.at[].add` scatters
        # serialize on TPU), and returns the identical value. The radix
        # select below exists for the SHARDED path, where it needs only
        # ceil(nbits/8) exact integer psum rounds instead of a cross-shard
        # gather/sort.
        return jnp.sort(costs)[target - 1]

    nbits = costs.dtype.itemsize * 8
    udt = jnp.uint32 if nbits == 32 else jnp.uint64
    sign = jnp.asarray(1, udt) << (nbits - 1)
    b = jax.lax.bitcast_convert_type(costs, udt)
    key = jnp.where(b & sign != 0, ~b, b | sign)

    digit_bits = 8
    nbuckets = 1 << digit_bits
    mask = jnp.asarray(nbuckets - 1, udt)
    prefix = jnp.zeros((), udt)  # selected high bits so far
    rank = jnp.asarray(target, jnp.int32)  # rank within the current bucket
    for r in range(nbits // digit_bits):
        shift = nbits - digit_bits * (r + 1)
        digit = (key >> shift) & mask
        if r == 0:
            active = jnp.ones_like(digit, jnp.int32)
        else:
            active = (key >> (shift + digit_bits) == prefix).astype(jnp.int32)
        hist = jnp.zeros((nbuckets,), jnp.int32).at[digit].add(
            active, mode="drop"
        )
        if axis_name is not None:
            hist = jax.lax.psum(hist, axis_name)
        cum = jnp.cumsum(hist)
        bucket = jnp.argmax(cum >= rank).astype(jnp.int32)
        below = jnp.where(bucket > 0, cum[bucket - 1], 0)
        rank = rank - below
        prefix = (prefix << digit_bits) | bucket.astype(udt)
    # invert the monotone transform: prefix is the k-th smallest key
    raw = jnp.where(prefix & sign != 0, prefix & ~sign, ~prefix)
    return jax.lax.bitcast_convert_type(raw, costs.dtype)


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
        exactly vanilla MPPI. Works sharded: the threshold radix select spans
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
