"""Unit tests for the prior distribution library vs scipy closed forms, and
for the BetaPrior coordinate-delta operation used by the CGGibbs engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from mcmcglm_tpu.models import (
    Exponential,
    Gamma,
    IIDPrior,
    Laplace,
    MultivariateNormal,
    MVNPrior,
    Normal,
    StackedPrior,
    StudentT,
    Uniform,
    make_beta_prior,
)

X = np.linspace(0.1, 3.0, 17)
XR = np.linspace(-3.0, 3.0, 17)


def _assert_close(a, b, rtol=1e-5, atol=1e-7):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


class TestUnivariate:
    @pytest.mark.parametrize(
        "dist,ref,xs",
        [
            (Normal(0.5, 1.3), st.norm(0.5, 1.3), XR),
            (Gamma(2.0, 1.5), st.gamma(2.0, scale=1 / 1.5), X),
            (Exponential(2.0), st.expon(scale=0.5), X),
            (StudentT(4.0, 0.3, 1.2), st.t(4.0, 0.3, 1.2), XR),
            (Laplace(0.2, 0.8), st.laplace(0.2, 0.8), XR),
            (Uniform(-1.0, 2.0), st.uniform(-1.0, 3.0), XR),
        ],
    )
    def test_log_prob(self, dist, ref, xs):
        got = dist.log_prob(jnp.asarray(xs))
        expected = ref.logpdf(xs)
        mask = np.isfinite(expected)
        _assert_close(np.asarray(got)[mask], expected[mask])
        assert np.all(np.asarray(got)[~mask] == -np.inf) or mask.all()

    @pytest.mark.parametrize(
        "dist,ref",
        [
            (Normal(0.5, 1.3), st.norm(0.5, 1.3)),
            (Gamma(2.0, 1.5), st.gamma(2.0, scale=1 / 1.5)),
            (Exponential(2.0), st.expon(scale=0.5)),
            (StudentT(5.0, 0.3, 1.2), st.t(5.0, 0.3, 1.2)),
            (Laplace(0.2, 0.8), st.laplace(0.2, 0.8)),
        ],
    )
    def test_moments_and_sampling(self, dist, ref):
        assert np.isclose(dist.mean(), ref.mean())
        assert np.isclose(dist.variance(), ref.var())
        samples = dist.sample(jax.random.key(0), (20000,))
        assert np.isclose(np.mean(np.asarray(samples)), ref.mean(), atol=4 * ref.std() / np.sqrt(20000))

    def test_mvn_log_prob(self):
        cov = np.array([[1.0, 0.5], [0.5, 2.0]])
        loc = np.array([1.0, -1.0])
        mvn = MultivariateNormal(loc, cov)
        pts = np.array([[0.0, 0.0], [1.0, -1.0], [2.0, 1.0]])
        expected = st.multivariate_normal(loc, cov).logpdf(pts)
        got = jax.vmap(mvn.log_prob)(jnp.asarray(pts))
        _assert_close(got, expected, rtol=1e-5)


class TestBetaPriorDelta:
    """coord_log_prob(beta, j, b) must equal log_prob_beta(beta with b at j)
    up to a b-independent constant: check differences of two proposals."""

    @pytest.mark.parametrize(
        "prior",
        [
            IIDPrior(Normal(0.0, 1.0), 4),
            IIDPrior(Laplace(0.0, 1.0), 4),
            StackedPrior([Normal(0, 1), Gamma(1, 1), Exponential(2.0), StudentT(4.0)]),
            MVNPrior(
                np.array([0.0, 1.0, -1.0, 0.5]),
                np.array(
                    [
                        [2.0, 0.5, 0.2, 0.0],
                        [0.5, 1.0, 0.1, 0.0],
                        [0.2, 0.1, 1.5, 0.3],
                        [0.0, 0.0, 0.3, 1.0],
                    ]
                ),
            ),
        ],
    )
    def test_delta_consistency(self, prior):
        beta = jnp.asarray([0.3, 0.8, 0.5, 0.1], jnp.float64)
        for j in range(4):
            for b1, b2 in [(0.7, 0.2), (1.5, 0.9)]:
                full1 = prior.log_prob_beta(beta.at[j].set(b1))
                full2 = prior.log_prob_beta(beta.at[j].set(b2))
                d1 = prior.coord_log_prob(beta, j, jnp.float64(b1))
                d2 = prior.coord_log_prob(beta, j, jnp.float64(b2))
                _assert_close(d1 - d2, full1 - full2, rtol=1e-6, atol=1e-6)

    def test_traced_j(self):
        prior = StackedPrior([Normal(0, 1), Gamma(2, 1), Exponential(1.0)])
        beta = jnp.asarray([0.1, 0.5, 0.9])

        @jax.jit
        def f(j, b):
            return prior.coord_log_prob(beta, j, b)

        for j, d in enumerate(prior.dists):
            _assert_close(f(j, 0.4), d.log_prob(0.4), rtol=1e-6)


class TestMakeBetaPrior:
    def test_iid(self):
        p = make_beta_prior(Normal(0, 1), 5)
        assert isinstance(p, IIDPrior) and p.d == 5

    def test_list(self):
        p = make_beta_prior([Normal(0, 1), Gamma(1, 1)], 2)
        assert isinstance(p, StackedPrior)

    def test_list_length_mismatch(self):
        with pytest.raises(ValueError, match="list length"):
            make_beta_prior([Normal(0, 1)], 3)

    def test_mvn(self):
        p = make_beta_prior(MultivariateNormal(np.zeros(3), np.eye(3)), 3)
        assert isinstance(p, MVNPrior)

    def test_correct_stacked_density(self):
        """The reference's list-prior density is buggy (sums every marginal
        over the whole vector, R/glm_utils.R:113-115); ours must be the
        correct sum_j log f_j(beta_j)."""
        dists = [Normal(0, 1), Normal(2, 3)]
        p = StackedPrior(dists)
        beta = jnp.asarray([0.5, 1.0])
        expected = st.norm(0, 1).logpdf(0.5) + st.norm(2, 3).logpdf(1.0)
        _assert_close(p.log_prob_beta(beta), expected, rtol=1e-6)
