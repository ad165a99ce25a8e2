"""Tests for model-criticism tools (WAIC/LOO) and rank-normalised
diagnostics — all beyond the reference's surface."""

import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.diagnostics import ess, rank_normalize, split_rhat


@pytest.fixture(scope="module")
def fit():
    X, y, _ = generate_glm_data("binomial", n=600, d=4, seed=0)
    return mg.mcmcglm(family="binomial", X=X, y=y, n_samples=300, burnin=100,
                      n_chains=4, w=0.8)


class TestWAIC:
    def test_p_waic_near_param_count(self, fit):
        w = fit.waic()
        # effective parameter count ~ d for a well-identified model
        assert 1.5 < w["p_waic"] < 8.0
        assert w["waic"] == pytest.approx(-2 * w["elpd_waic"])

    def test_loo_agrees_with_waic(self, fit):
        w, l = fit.waic(), fit.loo()
        assert abs(w["elpd_waic"] - l["elpd_loo"]) < 5.0
        assert l["p_loo"] > 0

    def test_model_comparison_orders_correctly(self):
        """WAIC must prefer the true model over one missing a covariate."""
        rng = np.random.default_rng(1)
        n = 800
        X = np.column_stack([np.ones(n), rng.normal(size=n), rng.normal(size=n)])
        y = rng.binomial(1, 1 / (1 + np.exp(-X @ [0.3, 1.2, 0.0]))).astype(float)
        common = dict(n_samples=250, burnin=80, n_chains=4, w=0.8)
        full = mg.mcmcglm(family="binomial", X=X[:, :2], y=y, **common)
        null = mg.mcmcglm(family="binomial", X=X[:, :1], y=y, **common)
        assert full.waic()["elpd_waic"] > null.waic()["elpd_waic"]


class TestRankNormalized:
    def test_heavy_tail_robustness(self):
        rng = np.random.default_rng(2)
        x = rng.standard_cauchy(size=(4, 2000))
        # rank-normalised ESS finite and near iid total; plain may be unstable
        e = ess(x, rank_normalized=True)
        assert 0.5 * 8000 < e < 2 * 8000
        assert abs(split_rhat(x, rank_normalized=True) - 1.0) < 0.02

    def test_rank_normalize_shape_and_monotone(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 50, 3))
        z = rank_normalize(x)
        assert z.shape == x.shape
        flat_x = x[:, :, 0].ravel()
        flat_z = z[:, :, 0].ravel()
        order = np.argsort(flat_x)
        assert (np.diff(flat_z[order]) > 0).all()


class TestThin:
    def test_thin_through_api(self):
        X, y, _ = generate_glm_data("binomial", n=400, d=5, seed=4)
        fit = mg.mcmcglm(family="binomial", X=X, y=y, n_samples=400,
                         burnin=100, n_chains=4, w=0.8, thin=4)
        assert fit.beta.shape == (4, 76, 5)  # init + 300/4 draws
        assert fit.burnin == 0  # thinned draws are post-burn-in
        assert np.isfinite(fit.coef().values).all()
