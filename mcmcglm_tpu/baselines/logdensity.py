"""The shared full-vector log posterior for the baseline samplers.

BASELINE.json requires NUTS/HMC and VI baselines "on the same log-density"
as the CGGibbs engine: log p(beta) = sum_i log f(y_i | linkinv(x_i beta)) +
log prior(beta).  Unlike the coordinate-wise engine (which needs only
relative single-coordinate deltas), these samplers need the full
differentiable log posterior and its gradient — one (n,d) matvec plus a
fused elementwise pass per evaluation, which is MXU + VPU work batched over
chains.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax.numpy as jnp

import jax

from ..models.families import check_family
from ..models.priors import BetaPrior
from ..utils.linalg import matvec

__all__ = ["make_log_posterior"]


def make_log_posterior(
    X, y, family, prior: BetaPrior, extra: Optional[Mapping] = None, dtype=jnp.float32
):
    """Returns ``logpost(beta) -> scalar`` (jit/vmap/grad-safe).

    Semantics match the engine's potential: likelihood via the family's
    fused eta path (models/families.py) + full prior log density
    (R/glm_utils.R:212-217 composition).
    """
    family = check_family(family)
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        dtype = jnp.float32  # avoid per-op truncation warnings
    Xt = jnp.asarray(X, dtype).T
    y = jnp.asarray(y, dtype).reshape(-1)
    extra = {k: jnp.asarray(v, dtype) for k, v in dict(extra or {}).items()}

    def logpost(beta):
        eta = matvec(beta.astype(dtype), Xt)
        ll = jnp.sum(family.log_density_eta(eta, y, extra))
        return ll + prior.log_prob_beta(beta)

    return logpost
