"""Cross-validation tests: HMC, NUTS and ADVI on the same log posterior must
reproduce the closed-form gaussian posterior and agree with CGGibbs on a
logistic model (the BASELINE.json cross-validation requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.baselines import advi_fit, hmc_sample, make_log_posterior, nuts_sample


@pytest.fixture(scope="module")
def gaussian_problem():
    rng = np.random.default_rng(0)
    n, d = 500, 4
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta = np.array([1.0, -0.5, 0.8, 0.2])
    y = rng.normal(X @ beta, 1.0)
    prec = X.T @ X + np.eye(d)
    cov = np.linalg.inv(prec)
    mu = cov @ (X.T @ y)
    return X, y, mu, cov


@pytest.fixture(scope="module")
def gaussian_logpost(gaussian_problem):
    X, y, _, _ = gaussian_problem
    prior = mg.IIDPrior(mg.Normal(0.0, 1.0), X.shape[1])
    return make_log_posterior(
        X, y, "gaussian", prior, extra={"sd": 1.0}, dtype=jnp.float64
    )


class TestHMC:
    def test_gaussian_posterior(self, gaussian_problem, gaussian_logpost):
        X, y, mu, cov = gaussian_problem
        d = X.shape[1]
        init = jnp.zeros((4, d), jnp.float64)
        res = hmc_sample(
            jax.random.key(0), gaussian_logpost, init,
            n_warmup=400, n_samples=400, num_leapfrog=16,
        )
        draws = np.asarray(res.samples).reshape(-1, d)
        sd = np.sqrt(np.diag(cov))
        np.testing.assert_allclose(draws.mean(0), mu, atol=float(5 * sd.max() / 20))
        np.testing.assert_allclose(draws.std(0), sd, rtol=0.3)
        assert float(res.accept_rate.mean()) > 0.5


class TestNUTS:
    def test_gaussian_posterior(self, gaussian_problem, gaussian_logpost):
        X, y, mu, cov = gaussian_problem
        d = X.shape[1]
        init = jnp.zeros((4, d), jnp.float64)
        res = nuts_sample(
            jax.random.key(1), gaussian_logpost, init,
            n_warmup=400, n_samples=400, max_depth=8,
        )
        draws = np.asarray(res.samples).reshape(-1, d)
        sd = np.sqrt(np.diag(cov))
        np.testing.assert_allclose(draws.mean(0), mu, atol=float(5 * sd.max() / 20))
        np.testing.assert_allclose(draws.std(0), sd, rtol=0.3)
        assert float(res.accept_rate.mean()) > 0.5
        # trees should actually grow (not immediate U-turns)
        assert float(res.mean_depth.mean()) >= 1.0

    def test_nuts_matches_cggibbs_logistic(self):
        rng = np.random.default_rng(2)
        n, d = 800, 3
        X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
        beta = np.array([0.4, 1.0, -0.7])
        y = rng.binomial(1, 1 / (1 + np.exp(-X @ beta))).astype(float)
        prior = mg.IIDPrior(mg.Normal(0.0, 2.0), d)

        eng = mg.CGGibbs(X, y, "binomial", prior, tuning={"w": 0.8})
        g, _, _ = eng.sample(jax.random.key(0), 400, n_chains=4)
        gibbs = g[:, 101:, :].reshape(-1, d)

        logpost = make_log_posterior(X, y, "binomial", prior, dtype=jnp.float64)
        res = nuts_sample(
            jax.random.key(3), logpost, jnp.zeros((4, d), jnp.float64),
            n_warmup=300, n_samples=300,
        )
        nuts = np.asarray(res.samples).reshape(-1, d)
        np.testing.assert_allclose(gibbs.mean(0), nuts.mean(0), atol=0.08)
        np.testing.assert_allclose(gibbs.std(0), nuts.std(0), rtol=0.3)


class TestADVI:
    def test_gaussian_posterior(self, gaussian_problem, gaussian_logpost):
        X, y, mu, cov = gaussian_problem
        d = X.shape[1]
        res = advi_fit(
            jax.random.key(0), gaussian_logpost, jnp.zeros(d, jnp.float64),
            n_steps=3000, mc_samples=8, learning_rate=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.mean), mu, atol=0.05)
        # mean-field underestimates correlated variances; check scale order
        np.testing.assert_allclose(
            np.asarray(res.scale), np.sqrt(np.diag(cov)), rtol=0.6
        )
        # ELBO should have improved substantially
        elbo = np.asarray(res.elbo_trace)
        assert elbo[-100:].mean() > elbo[:100].mean()

    def test_sample_shape(self, gaussian_logpost):
        res = advi_fit(
            jax.random.key(0), gaussian_logpost, jnp.zeros(4, jnp.float64),
            n_steps=200,
        )
        s = res.sample(jax.random.key(1), 64)
        assert s.shape == (64, 4)


class TestEllipticalSliceMV:
    """Whole-vector elliptical slice sampling (qslice's slice_elliptical_mv
    analogue) — must reproduce closed-form gaussian posteriors exactly."""

    def test_gaussian_posterior(self, gaussian_problem):
        from mcmcglm_tpu.baselines import EllipticalSliceGLM

        X, y, mu, cov = gaussian_problem
        d = X.shape[1]
        eng = EllipticalSliceGLM(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            extra={"sd": 1.0},
        )
        betas, nev, _ = eng.sample(jax.random.key(0), 4000, n_chains=8)
        post = betas[:, 1500:, :].reshape(-1, d)
        sd = np.sqrt(np.diag(cov))
        np.testing.assert_allclose(post.mean(0), mu, atol=float(6 * sd.max() / 30))
        np.testing.assert_allclose(post.std(0), sd, rtol=0.25)
        assert float(np.asarray(nev).mean()) < 20

    def test_mvn_prior(self):
        from mcmcglm_tpu.baselines import EllipticalSliceGLM

        rng = np.random.default_rng(5)
        n, d = 40, 3
        X = np.column_stack([np.ones(n), rng.normal(size=(n, 2))])
        y = rng.normal(X @ [0.5, -0.2, 0.3], 2.0)
        cov0 = np.array([[1.0, 0.4, 0.0], [0.4, 1.0, 0.0], [0.0, 0.0, 2.0]])
        prior = mg.MVNPrior(np.zeros(3), cov0)
        eng = EllipticalSliceGLM(X, y, "gaussian", prior, extra={"sd": 2.0})
        betas, _, _ = eng.sample(jax.random.key(1), 3000, n_chains=8)
        post = betas[:, 500:, :].reshape(-1, d)
        prec = X.T @ X / 4 + np.linalg.inv(cov0)
        mu = np.linalg.solve(prec, X.T @ y / 4)
        sd = np.sqrt(np.diag(np.linalg.inv(prec)))
        np.testing.assert_allclose(post.mean(0), mu, atol=float(6 * sd.max() / 30))

    def test_requires_gaussian_prior(self):
        from mcmcglm_tpu.baselines import EllipticalSliceGLM

        X = np.ones((10, 2))
        with pytest.raises(ValueError, match="gaussian prior"):
            EllipticalSliceGLM(X, np.zeros(10), "gaussian",
                               mg.IIDPrior(mg.Laplace(0, 1), 2))
