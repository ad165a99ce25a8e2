"""Observation-weight tests: weight w must equal w-fold duplicated data."""

import jax
import numpy as np
import pytest

import mcmcglm_tpu as mg


class TestObsWeights:
    def test_weight_equals_duplication(self):
        rng = np.random.default_rng(0)
        n = 400
        X = np.column_stack([np.ones(n), rng.normal(size=n)])
        y = rng.normal(X @ [1.0, -0.5], 1.0)
        prior = mg.IIDPrior(mg.Normal(0, 1), 2)

        eng_w = mg.CGGibbs(
            X, y, "gaussian", prior, extra={"sd": 1.0},
            tuning={"w": 0.5}, obs_weights=np.full(n, 2.0),
        )
        bw, _, _ = eng_w.sample(jax.random.key(0), 300, n_chains=4)

        eng_d = mg.CGGibbs(
            np.vstack([X, X]), np.concatenate([y, y]), "gaussian", prior,
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        bd, _, _ = eng_d.sample(jax.random.key(1), 300, n_chains=4)
        mw = bw[:, 101:, :].reshape(-1, 2)
        md = bd[:, 101:, :].reshape(-1, 2)
        np.testing.assert_allclose(mw.mean(0), md.mean(0), atol=0.02)
        np.testing.assert_allclose(mw.std(0), md.std(0), rtol=0.25)

    def test_conjugate_weighted(self):
        """normal-normal path must use the weighted closed form."""
        rng = np.random.default_rng(1)
        n = 300
        X = np.column_stack([np.ones(n), rng.normal(size=n)])
        y = rng.normal(X @ [0.5, 1.0], 1.0)
        w = rng.uniform(0.5, 3.0, n)
        eng = mg.CGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 2),
            extra={"sd": 1.0}, obs_weights=w,
            config=mg.EngineConfig(sample_method="normal-normal"),
        )
        b, _, _ = eng.sample(jax.random.key(0), 600, n_chains=4)
        post = b[:, 101:, :].reshape(-1, 2)
        prec = (X * w[:, None]).T @ X + np.eye(2)
        mu = np.linalg.solve(prec, X.T @ (w * y))
        sd = np.sqrt(np.diag(np.linalg.inv(prec)))
        np.testing.assert_allclose(
            post.mean(0), mu, atol=float(5 * sd.max() / np.sqrt(500))
        )

    def test_length_validation(self):
        X = np.ones((10, 2))
        with pytest.raises(ValueError, match="obs_weights length"):
            mg.CGGibbs(X, np.zeros(10), "gaussian",
                       mg.IIDPrior(mg.Normal(0, 1), 2), tuning={"w": 0.5},
                       obs_weights=np.ones(7))

    def test_api_weights(self):
        rng = np.random.default_rng(2)
        n = 300
        X = np.column_stack([np.ones(n), rng.normal(size=n)])
        y = rng.binomial(1, 1 / (1 + np.exp(-X @ [0.3, 0.9]))).astype(float)
        fit = mg.mcmcglm(family="binomial", X=X, y=y, weights=np.ones(n),
                         n_samples=100, burnin=30, w=0.8)
        assert np.isfinite(fit.coef().values).all()
