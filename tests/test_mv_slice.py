"""Tests for the whole-vector multivariate slice samplers
(baselines/mv_slice.py): hyperrect, latent-mv, quantile-mv.

Validation strategy mirrors the univariate kernels' (SURVEY.md §4):
exact recovery of a known gaussian conjugate posterior (mean AND sd), a
non-gaussian (logistic) recovery check, and bookkeeping invariants.
"""

import numpy as np
import jax
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.baselines import (
    HyperrectSliceGLM,
    LatentSliceGLM,
    QuantileSliceGLM,
)
from mcmcglm_tpu.datagen import generate_glm_data


def _gaussian_problem(n=300, d=3, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta_true = np.linspace(1.0, -0.5, d)
    y = X @ beta_true + rng.normal(size=n)
    P = X.T @ X + np.eye(d)
    mu = np.linalg.solve(P, X.T @ y)
    sd = np.sqrt(np.diag(np.linalg.inv(P)))
    return X, y, mu, sd


def _make(cls, X, y, d, **kw):
    return cls(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        extra={"sd": 1.0}, **kw,
    )


SAMPLERS = [
    (HyperrectSliceGLM, {"w": 0.5}),
    (LatentSliceGLM, {"rate": 3.0}),
    (QuantileSliceGLM, {"pseudo_scale": 1.0}),
]


@pytest.mark.parametrize("cls,kw", SAMPLERS)
def test_gaussian_conjugate_recovery(cls, kw):
    X, y, mu, sd = _gaussian_problem()
    d = X.shape[1]
    eng = _make(cls, X, y, d, **kw)
    betas, nev, _ = eng.sample(jax.random.key(1), 3000, n_chains=16)
    post = betas[:, 500:, :].reshape(-1, d)
    assert np.abs(post.mean(0) - mu).max() < 0.03
    assert np.abs(post.std(0) / sd - 1.0).max() < 0.12
    assert (nev >= 1).all()


@pytest.mark.parametrize("cls,kw", [
    (HyperrectSliceGLM, {"w": 0.4}),
    (LatentSliceGLM, {"rate": 4.0}),
    (QuantileSliceGLM, {"pseudo_scale": 0.8, "pseudo_family": "normal"}),
])
def test_logistic_recovery(cls, kw):
    """Non-gaussian likelihood: posterior mean should sit near the truth
    (z-score < 3 against the posterior sd)."""
    X, y, beta_true = generate_glm_data("binomial", n=800, d=4, seed=3)
    eng = cls(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 4), **kw,
    )
    betas, _, _ = eng.sample(jax.random.key(2), 2500, n_chains=8)
    post = betas[:, 500:, :].reshape(-1, 4)
    z = np.abs(post.mean(0) - beta_true) / np.maximum(post.std(0), 1e-9)
    assert z.max() < 3.0


def test_latent_widths_follow_rate():
    """The latent sampler's carried widths obey s = 2|l - x| + Exp(rate):
    in a concentrated posterior (|l - x| small) the Exp(rate) term with
    mean 1/rate dominates, so a larger rate yields smaller brackets."""
    X, y, mu, sd = _gaussian_problem()
    d = X.shape[1]
    means = {}
    for rate in (0.5, 20.0):
        eng = _make(LatentSliceGLM, X, y, d, rate=rate)
        st = eng.init(jax.random.key(0), 8)
        st, _, _ = eng.run(st, 300)
        s = np.asarray(st.aux)
        assert s.shape == (8, d) and np.isfinite(s).all() and (s > 0).all()
        means[rate] = float(s.mean())
    assert means[20.0] < means[0.5] / 5.0


def test_prior_dim_mismatch_raises():
    X, y, _, _ = _gaussian_problem()
    with pytest.raises(ValueError, match="prior dimension"):
        HyperrectSliceGLM(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 7), w=0.5
        )


def test_quantile_bad_pseudo_family_raises():
    X, y, _, _ = _gaussian_problem()
    with pytest.raises(ValueError, match="pseudo_family"):
        QuantileSliceGLM(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
            pseudo_family="laplace",
        )
