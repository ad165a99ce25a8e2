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
from jax import lax

__all__ = [
    "ChainMoments",
    "init_moments",
    "update_moments",
    "pooled_summary",
    "ESSState",
    "init_ess",
    "update_ess",
    "ess_from_state",
    "ess_device",
]


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


# -- streaming min-ESS on device (SURVEY §8.3) ---------------------------
#
# The north-star metric is min-ESS/s, but the FFT estimator in
# diagnostics.ess needs the full (C, K, d) draw tensor on the host
# (~2.4 GB at the 4096-chain pod configuration).  The accumulator below
# streams the SAME estimator — split-chain halves, per-chain
# autocovariance, Stan's cross-chain combination, Geyer's initial
# monotone positive sequence — up to a fixed maximum lag L, updated one
# kept draw at a time on device.  For well-mixed (thinned) chains the
# Geyer truncation lag is far below L, so the two estimators agree
# exactly-up-to-arithmetic; the host transfer drops from (C, K, d) to
# the (d,) ESS vector (tests/test_streaming_ess.py quantifies the
# agreement).
#
# Per (chain, half) the exact centered autocovariance at lag l needs
#   S_l       = sum_t x_t x_{t-l}          (raw lagged cross products)
#   head_l    = sum of the FIRST l draws   (edge trim for sum_{t>=l} x_t)
#   tail_l    = sum of the LAST  l draws   (edge trim for sum_{t<K-l} x_t)
#   total, K
# so the state is three (C, 2, L, d) buffers (cross products, a lag-
# ordered ring of the last L draws, the first L draws) + totals —
# O(C·L·d) regardless of run length.  The per-draw update is a ring
# shift + one fused multiply-accumulate over (C, L, d): trivial traffic
# next to the ~d passes of (C, n) streams a sweep costs.


class ESSState(NamedTuple):
    """Streaming split-chain autocovariance state.

    Shapes: s/ring/first (C, 2, L, d); total (C, 2, d); count () int32
    (draws seen so far — identical across chains by construction of
    run_thinned); planned () int32 (total kept draws this collection,
    fixed up front so the split-half boundary is known)."""

    s: jax.Array
    ring: jax.Array
    first: jax.Array
    total: jax.Array
    count: jax.Array
    planned: jax.Array


def init_ess(n_chains: int, d: int, planned: int, max_lag: int = 64,
             dtype=jnp.float32) -> ESSState:
    """Fresh accumulator for ``planned`` kept draws per chain.  ``max_lag``
    bounds the autocovariance window per split half; the estimate equals
    the full FFT estimator whenever Geyer truncation occurs before
    ``max_lag`` (always, for thinned well-mixed chains).  Lags beyond the
    split-half length would be uninitialised garbage, so ``max_lag`` is
    clamped to ``planned // 2``."""
    L = max(2, min(int(max_lag), int(planned) // 2))
    z = jnp.zeros((n_chains, 2, L, d), dtype)
    return ESSState(
        s=z, ring=z, first=z,
        total=jnp.zeros((n_chains, 2, d), dtype),
        count=jnp.zeros((), jnp.int32),
        planned=jnp.asarray(planned, jnp.int32),
    )


def update_ess(st: ESSState, x: jax.Array) -> ESSState:
    """Accumulate one kept draw x (C, d) into its split half.

    Split semantics match diagnostics._split_chains exactly: with
    half = planned // 2, draws t < half feed half 0, draws
    t >= planned - half feed half 1, and the middle draw of an odd-length
    collection feeds neither."""
    C, _, L, d = st.s.shape
    t = st.count
    half = st.planned // 2
    # segment membership + within-segment time
    in0 = t < half
    in1 = t >= st.planned - half
    seg_t = jnp.where(in0, t, t - (st.planned - half))
    gate = (in0 | in1).astype(st.s.dtype)
    seg = jnp.where(in0, 0, 1)
    seg_mask = (
        jax.nn.one_hot(seg, 2, dtype=st.s.dtype) * gate
    )[None, :, None, None]  # (1, 2, 1, 1)

    xb = x[:, None, None, :]  # (C, 1, 1, d)
    # lag-ordered ring: after the shift, ring[:, :, l] holds x_{t-l}
    ring_new = jnp.concatenate(
        [jnp.broadcast_to(xb, (C, 2, 1, d)), st.ring[:, :, :-1]], axis=2
    )
    ring = st.ring + seg_mask * (ring_new - st.ring)
    # raw cross products: S_l += x_t * x_{t-l} for l <= t (younger lags
    # reference draws from before this segment started -> masked)
    lag_ok = (
        jnp.arange(L)[None, None, :, None] <= seg_t
    ).astype(st.s.dtype)
    s = st.s + seg_mask * lag_ok * (xb * ring)
    # first-L buffer: one-hot row write while seg_t < L
    row_hit = (
        (jnp.arange(L)[None, None, :, None] == seg_t).astype(st.s.dtype)
        * seg_mask
    )
    first = st.first + row_hit * (xb - st.first)
    total = st.total + seg_mask[:, :, 0, :] * xb[:, :, 0, :]
    return st._replace(
        s=s, ring=ring, first=first, total=total, count=t + 1
    )


def ess_from_state(st: ESSState, cap: bool = True):
    """Combined bulk ESS per parameter from the streamed state: (d,).

    Mirrors diagnostics._ess_1d (Stan's estimator) with the lag window
    truncated at L; all reductions are over the chain axis, so under a
    chain-sharded mesh this lowers to psums and nothing larger than (d,)
    leaves the device."""
    C, _, L, d = st.s.shape
    K = st.planned // 2  # draws per split half
    Kf = K.astype(st.s.dtype) if hasattr(K, "astype") else jnp.asarray(
        K, st.s.dtype
    )
    lags = jnp.arange(L, dtype=st.s.dtype)[None, None, :, None]
    nterm = jnp.maximum(Kf - lags, 1.0)  # terms in each lag sum
    mean = st.total / jnp.maximum(Kf, 1.0)  # (C, 2, d)
    # edge-trimmed sums: sum_{t>=l} x = total - (first l draws),
    #                    sum_{t<K-l} x = total - (last l draws)
    csum_first = jnp.cumsum(st.first, axis=2)  # (C, 2, L, d)
    head = jnp.concatenate(
        [jnp.zeros_like(csum_first[:, :, :1]), csum_first[:, :, :-1]],
        axis=2,
    )  # sum of first l draws at slot l
    csum_ring = jnp.cumsum(st.ring, axis=2)
    tail = jnp.concatenate(
        [jnp.zeros_like(csum_ring[:, :, :1]), csum_ring[:, :, :-1]], axis=2
    )  # sum of last l draws at slot l
    m4 = mean[:, :, None, :]
    total4 = st.total[:, :, None, :]
    # sum_t (x_t - m)(x_{t-l} - m)
    centered = (
        st.s
        - m4 * (total4 - head)  # sum_{t>=l} x_t
        - m4 * (total4 - tail)  # sum_{t<K-l} x_t (the x_{t-l} factor)
        + nterm * m4 * m4
    )
    acov = centered / jnp.maximum(Kf, 1.0)  # Stan's biased 1/K form
    # flatten halves into 2C chains, combine across chains
    acov = acov.reshape(C * 2, L, d)
    mean2 = mean.reshape(C * 2, d)
    chain_var = acov[:, 0, :] * Kf / jnp.maximum(Kf - 1.0, 1.0)  # (2C, d)
    return _ess_combine(
        jnp.mean(acov, axis=0), chain_var, mean2, Kf, cap
    )


def _ess_combine(mean_acov, chain_var, chain_means, Kf, cap=True):
    """Stan's cross-chain combination + Geyer truncation, shared by the
    streaming accumulator and the on-device buffer estimator.

    mean_acov (L, d): autocovariance averaged over the 2C half-chains;
    chain_var (2C, d): per-half lag-0 variance (unbiased); chain_means
    (2C, d); Kf: draws per half."""
    L = mean_acov.shape[0]
    C2 = chain_var.shape[0]
    mean_var = jnp.mean(chain_var, axis=0)  # (d,)
    var_plus = mean_var * jnp.maximum(Kf - 1.0, 1.0) / jnp.maximum(Kf, 1.0)
    bvar = jnp.var(chain_means, axis=0, ddof=1)  # cross-chain mean var
    var_plus = var_plus + bvar
    rho = 1.0 - (mean_var[None, :] - mean_acov) / jnp.maximum(
        var_plus[None, :], 1e-30
    )
    rho = rho.at[0].set(1.0)
    # Geyer: pair sums, stop at first nonpositive RAW pair, running min
    P = L // 2
    pairs = rho[0 : 2 * P : 2] + rho[1 : 2 * P : 2]  # (P, d)
    pos = jnp.cumprod((pairs > 0).astype(rho.dtype), axis=0)
    mono = lax.associative_scan(jnp.minimum, pairs, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(pos * mono, axis=0)
    tau = jnp.where(pos[0] > 0, tau, 1.0)
    CK = C2 * Kf
    tau = jnp.maximum(tau, 1.0 / jnp.log10(CK + 10.0))
    out = CK / tau
    if cap:
        out = jnp.minimum(out, CK * jnp.log10(CK + 10.0))
    # degenerate guard (var_plus <= 0): everything effective
    return jnp.where(var_plus > 0, out, CK)


def ess_device(draws, max_lag: int = 64, cap: bool = True):
    """Combined bulk ESS per parameter, computed ON DEVICE from a resident
    (C, K, d) draws buffer — the pod run_passes path, where the buffer
    already lives chain-sharded in HBM and the FFT estimator would first
    gather ~GBs to the host over a slow link (SURVEY §8.3).  Jit it over
    the mesh: the chain reductions lower to psums and only the (d,) ESS
    vector is transferred.

    Same estimator as diagnostics.ess up to the ``max_lag`` window
    (split-chain halves, Stan combination, Geyer truncation); the lag
    sums stream the centered buffer once per lag (O(L * C * K * d)
    sequential element traffic — a fraction of a second at pod scale)."""
    C, K, d = draws.shape
    half = K // 2
    L = max(2, min(int(max_lag), half))
    x = jnp.stack([draws[:, :half], draws[:, K - half:]], 1)  # (C,2,h,d)
    m = jnp.mean(x, axis=2, keepdims=True)
    xc = x - m
    Kf = jnp.asarray(half, draws.dtype)
    tidx = jnp.arange(half)[None, None, :, None]

    def lag_acov(_, l):
        rolled = jnp.roll(xc, -l, axis=2)
        valid = (tidx < half - l).astype(draws.dtype)
        s = jnp.sum(xc * rolled * valid, axis=2) / Kf  # (C, 2, d)
        return None, jnp.mean(s.reshape(C * 2, d), axis=0)

    _, mean_acov = lax.scan(lag_acov, None, jnp.arange(L))  # (L, d)
    chain_var = jnp.var(
        xc.reshape(C * 2, half, d), axis=1, ddof=1
    ) * 1.0  # unbiased per half-chain
    chain_means = m.reshape(C * 2, d)
    return _ess_combine(mean_acov, chain_var, chain_means, Kf, cap)
