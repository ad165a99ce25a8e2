"""Integration tests for the CGGibbs engine.

Test strategy (SURVEY.md §4): known-truth recovery on the README example,
the conjugate normal-normal sampler as an exact oracle
(reference: R/mcmcglm.R:32-34 'implemented for testing purposes'), and
slice-vs-oracle distributional agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmcglm_tpu as mg


def closed_form_posterior(X, y, sd, prior_var):
    """Gaussian-gaussian posterior N(mu, cov) (R/sampling.R:8-9)."""
    d = X.shape[1]
    prec = X.T @ X / sd**2 + np.eye(d) / prior_var
    cov = np.linalg.inv(prec)
    mu = cov @ (X.T @ y) / sd**2
    return mu, cov


@pytest.fixture(scope="module")
def gaussian_engine(readme_gaussian_data):
    X, y, _ = readme_gaussian_data
    return mg.CGGibbs(
        X,
        y,
        "gaussian",
        mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
        extra={"sd": 1.0},
        tuning={"w": 0.5},
    )


class TestSliceRecovery:
    def test_readme_example_posterior_mean(self, readme_gaussian_data, gaussian_engine):
        """Posterior mean must match the closed-form gaussian-gaussian
        posterior within MC error (README example, README.md:61-81)."""
        X, y, beta_true = readme_gaussian_data
        betas, n_evals, _ = gaussian_engine.sample(
            jax.random.key(0), 500, n_chains=8
        )
        assert betas.shape == (8, 501, 3)
        post = betas[:, 101:, :].reshape(-1, 3)
        mu, cov = closed_form_posterior(X, y, 1.0, 1.0)
        sd = np.sqrt(np.diag(cov))
        np.testing.assert_allclose(post.mean(0), mu, atol=float(4 * sd.max() / np.sqrt(300)))
        # posterior spread too, not just location
        np.testing.assert_allclose(post.std(0), sd, rtol=0.2)
        assert np.all(n_evals > 0)

    def test_update_vs_naive_same_distribution(self, readme_gaussian_data):
        """linear_predictor_calc='naive' (full matvec per evaluation,
        R/glm_utils.R:206-208) must sample the same posterior."""
        X, y, _ = readme_gaussian_data
        out = {}
        for calc in ["update", "naive"]:
            eng = mg.CGGibbs(
                X,
                y,
                "gaussian",
                mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
                extra={"sd": 1.0},
                config=mg.EngineConfig(linear_predictor_calc=calc),
                tuning={"w": 0.5},
            )
            betas, _, _ = eng.sample(jax.random.key(1), 300, n_chains=4)
            out[calc] = betas[:, 101:, :].reshape(-1, 3)
        np.testing.assert_allclose(
            out["update"].mean(0), out["naive"].mean(0), atol=0.05
        )

    def test_same_key_reproducible(self, gaussian_engine):
        b1, _, _ = gaussian_engine.sample(jax.random.key(5), 50, n_chains=2)
        b2, _, _ = gaussian_engine.sample(jax.random.key(5), 50, n_chains=2)
        np.testing.assert_array_equal(b1, b2)

    def test_chunked_equals_unchunked(self, gaussian_engine):
        b1, _, _ = gaussian_engine.sample(jax.random.key(2), 60, n_chains=2)
        b2, _, _ = gaussian_engine.sample(jax.random.key(2), 60, n_chains=2, chunk_size=13)
        np.testing.assert_allclose(b1, b2, rtol=1e-6)


class TestConjugateOracle:
    def test_normal_normal_matches_closed_form(self, readme_gaussian_data):
        """The conjugate Gibbs sampler must reproduce the closed-form
        posterior mean AND covariance tightly (it is the test oracle;
        reference: R/sampling.R, vignettes/pospkg.Rmd:339-348)."""
        X, y, _ = readme_gaussian_data
        eng = mg.CGGibbs(
            X,
            y,
            "gaussian",
            mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
            extra={"sd": 1.0},
            config=mg.EngineConfig(sample_method="normal-normal"),
        )
        betas, _, _ = eng.sample(jax.random.key(3), 1000, n_chains=8)
        post = betas[:, 201:, :].reshape(-1, 3)
        mu, cov = closed_form_posterior(X, y, 1.0, 1.0)
        sd = np.sqrt(np.diag(cov))
        np.testing.assert_allclose(post.mean(0), mu, atol=float(4 * sd.max() / np.sqrt(1000)))
        np.testing.assert_allclose(np.cov(post.T), cov, rtol=0.25, atol=1e-4)

    def test_slice_matches_conjugate(self, readme_gaussian_data, gaussian_engine):
        """Slice path and conjugate oracle must agree in distribution —
        the reference's core correctness cross-check (pospkg.Rmd:339-348)."""
        X, y, _ = readme_gaussian_data
        b_slice, _, _ = gaussian_engine.sample(jax.random.key(11), 400, n_chains=8)
        eng_conj = mg.CGGibbs(
            X,
            y,
            "gaussian",
            mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
            extra={"sd": 1.0},
            config=mg.EngineConfig(sample_method="normal-normal"),
        )
        b_conj, _, _ = eng_conj.sample(jax.random.key(12), 400, n_chains=8)
        s = b_slice[:, 101:, :].reshape(-1, 3)
        c = b_conj[:, 101:, :].reshape(-1, 3)
        np.testing.assert_allclose(s.mean(0), c.mean(0), atol=0.03)
        np.testing.assert_allclose(s.std(0), c.std(0), rtol=0.2)


class TestOtherFamilies:
    def _fit_and_check(self, X, y, family, beta_true, extra=None, w=0.5, atol=0.35):
        d = X.shape[1]
        eng = mg.CGGibbs(
            X,
            y,
            family,
            mg.IIDPrior(mg.Normal(0.0, 10.0), d),
            extra=extra or {},
            tuning={"w": w},
        )
        betas, _, _ = eng.sample(jax.random.key(0), 400, n_chains=8)
        post = betas[:, 101:, :].reshape(-1, d)
        np.testing.assert_allclose(post.mean(0), beta_true, atol=atol)
        return post

    def test_logistic(self):
        rng = np.random.default_rng(0)
        n = 2000
        X = np.column_stack([np.ones(n), rng.normal(size=n), rng.binomial(1, 0.5, n)])
        beta = np.array([0.5, 1.0, -1.0])
        p = 1 / (1 + np.exp(-X @ beta))
        y = rng.binomial(1, p)
        self._fit_and_check(X, y, "binomial", beta)

    def test_poisson(self):
        rng = np.random.default_rng(1)
        n = 2000
        X = np.column_stack([np.ones(n), rng.normal(size=n) * 0.5])
        beta = np.array([1.0, 0.7])
        y = rng.poisson(np.exp(X @ beta))
        self._fit_and_check(X, y, "poisson", beta, w=0.3, atol=0.15)

    def test_negative_binomial(self):
        rng = np.random.default_rng(2)
        n = 2000
        X = np.column_stack([np.ones(n), rng.normal(size=n) * 0.5])
        beta = np.array([0.8, 0.5])
        mu = np.exp(X @ beta)
        # size=1 (geometric-like), matching the reference's hardcoded size
        y = rng.negative_binomial(1, 1 / (1 + mu))
        self._fit_and_check(X, y, "negative.binomial", beta, w=0.5, atol=0.3)


class TestPriors:
    def test_mvn_prior_pull(self, readme_gaussian_data):
        """An informative MVN prior at an off-truth location must pull the
        posterior exactly to the gaussian-gaussian closed form
        (prior-influence scenario, pospkg.Rmd:183)."""
        X, y, _ = readme_gaussian_data
        loc = np.array([5.0, 5.0, 5.0])
        prior_cov = 0.0001 * np.eye(3)
        prior = mg.MVNPrior(loc, prior_cov)
        # closed form with non-zero prior mean:
        prec = X.T @ X + np.linalg.inv(prior_cov)
        mu_post = np.linalg.solve(prec, X.T @ y + np.linalg.inv(prior_cov) @ loc)
        eng = mg.CGGibbs(
            X, y, "gaussian", prior, extra={"sd": 1.0}, tuning={"w": 0.5}
        )
        betas, _, _ = eng.sample(jax.random.key(0), 150, n_chains=2)
        post = betas[:, 51:, :].reshape(-1, 3)
        np.testing.assert_allclose(post.mean(0), mu_post, atol=0.05)

    def test_stacked_prior_runs(self, readme_gaussian_data):
        X, y, _ = readme_gaussian_data
        prior = mg.StackedPrior(
            [mg.Normal(0, 2), mg.StudentT(5.0, 0, 2), mg.Laplace(0, 2)]
        )
        eng = mg.CGGibbs(X, y, "gaussian", prior, extra={"sd": 1.0}, tuning={"w": 0.5})
        betas, _, _ = eng.sample(jax.random.key(0), 200, n_chains=4)
        post = betas[:, 51:, :].reshape(-1, 3)
        np.testing.assert_allclose(post.mean(0), [1.0, 1.5, 2.0], atol=0.2)


class TestValidation:
    def test_missing_tuning_param(self, readme_gaussian_data):
        X, y, _ = readme_gaussian_data
        with pytest.raises(ValueError, match="tuning parameter"):
            mg.CGGibbs(X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3))

    def test_prior_dim_mismatch(self, readme_gaussian_data):
        X, y, _ = readme_gaussian_data
        with pytest.raises(ValueError, match="dimension"):
            mg.CGGibbs(X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 5), tuning={"w": 0.5})
