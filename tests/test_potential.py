"""Tests for the exported model-math functions (reference parity surface:
log_density, log_likelihood, update_linear_predictor,
log_potential_from_betaj — R/glm_utils.R exports)."""

import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import mcmcglm_tpu as mg
from mcmcglm_tpu.models import log_potential_from_betaj, update_linear_predictor


def test_log_density_generic():
    mu = np.array([0.5, 0.9])
    y = np.array([1.0, 0.0])
    got = mg.log_density("binomial", jnp.asarray(mu), jnp.asarray(y))
    np.testing.assert_allclose(got, st.bernoulli.logpmf(y.astype(int), mu), rtol=1e-6)


def test_update_linear_predictor():
    eta = jnp.asarray([1.0, 2.0, 3.0])
    xj = jnp.asarray([0.5, -1.0, 2.0])
    out = update_linear_predictor(2.0, 0.5, eta, xj)
    np.testing.assert_allclose(out, np.array([1.0, 2.0, 3.0]) + 1.5 * np.array([0.5, -1.0, 2.0]))


def test_log_potential_update_equals_naive():
    """The two linear-predictor calculations must give the same potential
    (R/glm_utils.R:200-208 equivalence)."""
    rng = np.random.default_rng(0)
    n, d = 50, 4
    X = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    beta = jnp.asarray(rng.normal(size=d))
    eta = X @ beta
    prior = mg.IIDPrior(mg.Normal(0.0, 1.0), d)
    for j in range(d):
        a = log_potential_from_betaj(
            0.7, j, beta, eta, y, X, "gaussian", prior,
            linear_predictor_calc="update", extra={"sd": 1.0},
        )
        b = log_potential_from_betaj(
            0.7, j, beta, eta, y, X, "gaussian", prior,
            linear_predictor_calc="naive", extra={"sd": 1.0},
        )
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_log_potential_matches_direct():
    """log_potential == loglik(new beta) + logprior(new beta) computed from
    scratch (gaussian closed form)."""
    rng = np.random.default_rng(1)
    n, d = 30, 3
    X = rng.normal(size=(n, d))
    y = rng.normal(size=n)
    beta = rng.normal(size=d)
    j, b_new = 1, 0.3
    beta2 = beta.copy()
    beta2[j] = b_new
    expected = st.norm.logpdf(y, X @ beta2, 1.0).sum() + st.norm.logpdf(beta2).sum()
    got = log_potential_from_betaj(
        b_new, j, jnp.asarray(beta), jnp.asarray(X @ beta), jnp.asarray(y),
        jnp.asarray(X), "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        extra={"sd": 1.0},
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-6)
