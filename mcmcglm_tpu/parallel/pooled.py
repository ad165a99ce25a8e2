"""Pooled streaming diagnostics for pod-scale runs.

BASELINE config #5 (4096 chains x many sweeps x d params) cannot retain the
full draw history in HBM, and multi-host ESS/R-hat must not gather sample
matrices (SURVEY.md §8.3).  This module provides:

  * per-chain Welford moment accumulators updated on device every sweep
    (a (C, d) mean/m2 pair — O(C·d) state regardless of run length);
  * pooled posterior mean / variance and a pooled (non-split) R-hat
    computed from those moments — under a sharded chain axis the reductions
    lower to psums over the mesh, so no host gather of anything larger than
    (d,) ever occurs;
  * thinned-draw collection (engine.run_thinned) whose small retained
    subsample feeds the split-R-hat/ESS estimators in diagnostics.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ChainMoments", "init_moments", "update_moments", "pooled_summary"]


class ChainMoments(NamedTuple):
    count: jax.Array  # () draws per chain
    mean: jax.Array  # (C, d)
    m2: jax.Array  # (C, d)


def init_moments(n_chains: int, d: int, dtype=jnp.float32) -> ChainMoments:
    return ChainMoments(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((n_chains, d), dtype),
        m2=jnp.zeros((n_chains, d), dtype),
    )


def update_moments(m: ChainMoments, beta: jax.Array) -> ChainMoments:
    """Welford update with one draw per chain: beta (C, d)."""
    count = m.count + 1.0
    delta = beta - m.mean
    mean = m.mean + delta / count
    m2 = m.m2 + delta * (beta - mean)
    return ChainMoments(count, mean, m2)


def pooled_summary(m: ChainMoments):
    """Pooled posterior mean, variance and (non-split) R-hat per parameter.

    All reductions are over the chain axis — under a sharded mesh they
    lower to psums; the returned arrays are (d,).

    ``count`` may be a scalar (lockstep engines: every chain holds the same
    number of draws) or per-chain ``(C,)`` (the free-running engine commits
    sweeps asynchronously, so its accumulator counts per chain — by
    construction of run_thinned the counts are equal at block boundaries,
    but the shape is (C,)); both are accepted."""
    C = m.mean.shape[0]
    if m.count.ndim == 1:  # per-chain counts (free-running engine)
        Kc = m.count[:, None]  # (C, 1)
        K = jnp.mean(m.count)
    else:
        Kc = m.count
        K = m.count
    chain_var = m.m2 / jnp.maximum(Kc - 1.0, 1.0)  # (C, d)
    W = jnp.mean(chain_var, axis=0)
    grand_mean = jnp.mean(m.mean, axis=0)
    if C > 1:
        B = K * jnp.sum((m.mean - grand_mean) ** 2, axis=0) / (C - 1.0)
    else:
        B = jnp.zeros_like(W)
    var_plus = (K - 1.0) / K * W + B / K
    rhat = jnp.sqrt(var_plus / jnp.maximum(W, 1e-30))
    pooled_var = var_plus + jnp.sum((m.mean - grand_mean) ** 2, axis=0) / C
    return {
        "mean": grand_mean,
        "var": pooled_var,
        "rhat": rhat,
        "within_var": W,
        "between_var": B,
        "draws_per_chain": K,
    }
