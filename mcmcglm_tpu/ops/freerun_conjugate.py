"""Exact conjugate coordinate draws for the free-running CGGibbs engine.

For a gaussian response with identity link and an independent normal
prior, the coordinate conditional p(beta_j | beta_-j, y) is itself a
normal (the reference implements exactly this coordinate sampler as its
"normal-normal" validation path, R/sampling.R:19-35 — with a Schur
complement per draw because it never caches eta; SURVEY.md §3.1).  In
the freerun pass structure the draw costs ONE device pass per
coordinate — no slice level, no interval, no rejection:

    r_j   = y - eta + x_j * beta_j          (partial residual)
    tau_j = sum_i w_i x_ij^2 / sigma^2 + 1 / s_j^2
    mu_j  = (sum_i w_i x_ij r_ji / sigma^2 + m_j / s_j^2) / tau_j
    beta_j ~ N(mu_j, 1 / tau_j);  eta += x_j * (beta_j' - beta_j)

vs the slice kernel's ~2-3 evaluations (passes) per coordinate, and the
draw is EXACT — per-coordinate autocorrelation comes only from the
Gibbs scan itself, not from the slice kernel's within-coordinate
rejection dynamics.  This is the BASELINE config #4 fix (gaussian
p=10k stress, VERDICT r4 #2): the reference's √variance bug at
R/sampling.R:32-34 is NOT reproduced (PARITY.md).

``conjugate_params`` validates eligibility at engine construction
(gaussian family, identity link, diagonal normal prior, scalar sd);
``run_pass_conj`` is the per-pass kernel, signature-compatible with
``ops.freerun_passes.run_pass`` so every freerun collection mode
(run / run_passes / run_thinned / warmup, local and sharded) works
unchanged.  ``adapt``/``shrink_only``/``stepout_sweeps`` are accepted
and ignored — there are no widths to adapt; ``warmup`` becomes plain
burn-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.priors import IIDPrior, Normal, StackedPrior

__all__ = ["conjugate_params", "run_pass_conj"]


def conjugate_params(eng):
    """Validate conjugate-coordinate eligibility; return (m, s2) prior
    vectors ((d,) mean and variance).  Raises ValueError with the
    specific obstruction otherwise."""
    fam = eng.family
    if fam.name != "gaussian" or fam.link.name != "identity":
        raise ValueError(
            "coord_sampler='conjugate' requires the gaussian family with "
            f"identity link (got {fam.name!r} with {fam.link.name!r}); "
            "use the slice coordinate sampler for other models"
        )
    sd = eng.extra.get("sd", None)
    if sd is not None and jnp.ndim(sd) != 0:
        raise ValueError(
            "coord_sampler='conjugate' requires a scalar gaussian sd"
        )
    prior = eng.prior
    if isinstance(prior, IIDPrior) and isinstance(prior.dist, Normal):
        m = np.full((eng.d,), float(prior.dist.loc), np.float64)
        s2 = np.full((eng.d,), float(prior.dist.scale) ** 2, np.float64)
    elif isinstance(prior, StackedPrior) and all(
        isinstance(di, Normal) for di in prior.dists
    ):
        m = np.array([di.loc for di in prior.dists], np.float64)
        s2 = np.array([di.scale**2 for di in prior.dists], np.float64)
    else:
        raise ValueError(
            "coord_sampler='conjugate' requires an independent normal "
            "prior (IIDPrior(Normal) or StackedPrior of Normals); got "
            f"{type(prior).__name__} — MVN priors need the full-precision "
            "conditional: use engine='xla' sample_method='normal-normal'"
        )
    return m, s2


def run_pass_conj(eng, s, sweep_count, draws, nevbuf, n_sweeps: int,
                  adapt: bool, shrink_only: bool, stepout_sweeps=None):
    """One exact conjugate coordinate draw + commit for every chain.

    Every ACTIVE lane commits on every pass, so chains stay j-synchronised
    and a sweep costs exactly d passes (no cross-chain tail at all).
    INACTIVE lanes (sweep quota filled at a run boundary) are frozen
    outright — beta, eta, j and the PRNG-consuming draw are all gated, so
    resuming is trivially exact (the boundary-idle invariant of the slice
    passes, freerun.py)."""
    del adapt, shrink_only, stepout_sweeps  # no widths; warmup = burn-in
    dtype = eng.dtype
    C = s.beta.shape[0]
    rows = jnp.arange(C)
    active = sweep_count < n_sweeps

    key, k_z = jax.random.split(s.key)
    z = jax.random.normal(k_z, (C,), dtype=dtype)

    xg = jnp.take(eng.Xt, s.j, axis=0)  # (C, n) row gather
    b0 = jnp.take_along_axis(s.beta, s.j[:, None], axis=1)[:, 0]
    # weighted partial-residual cross product: sum_i w_i x_ij (y - eta)_i
    s1 = eng.reduce_fn(xg * (eng.y[None, :] - s.eta))  # (C,)
    sxx_j = jnp.take(eng._conj_sxx, s.j)  # (C,)
    m_j = jnp.take(eng._conj_m, s.j)
    s2_j = jnp.take(eng._conj_s2, s.j)
    inv_sig2 = eng._conj_inv_sigma2
    tau = sxx_j * inv_sig2 + 1.0 / s2_j
    mu = ((s1 + sxx_j * b0) * inv_sig2 + m_j / s2_j) / tau
    b_new = mu + z / jnp.sqrt(tau)
    b_star = jnp.where(active, b_new, b0)

    eta = s.eta + xg * (b_star - b0)[:, None]
    beta = eng._commit_row(s.beta, s.j, b_star)

    nev_new = s.nev + active.astype(jnp.int32)
    j_next = jnp.where(active, s.j + 1, s.j)
    sweep_done = active & (j_next >= eng.d)
    slot = jnp.where(sweep_done, sweep_count, n_sweeps)  # OOB => dropped
    draws, nevbuf = eng._sweep_buffers(
        draws, nevbuf, rows, slot, beta, nev_new, sweep_done
    )
    sweep_count = jnp.where(sweep_done, sweep_count + 1, sweep_count)
    j_next = jnp.where(sweep_done, 0, j_next)

    # slice automaton registers (level/L/R/budgets/...) are untouched:
    # the conjugate mode never reads them and a state never switches
    # coordinate samplers mid-run (coord_sampler is an engine constant)
    new_state = s._replace(
        beta=beta, eta=eta, key=key, j=j_next, nev=nev_new,
    )
    return new_state, sweep_count, draws, nevbuf
