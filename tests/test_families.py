"""Unit tests for families/links against scipy closed forms.

This is the bottom of the test pyramid the reference lacks entirely
(SURVEY.md §4: reference CI runs R CMD check with --no-tests)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st
from scipy.special import expit

from mcmcglm_tpu.models import (
    binomial,
    check_family,
    gamma,
    gaussian,
    get_link,
    inverse_gaussian,
    negative_binomial,
    poisson,
)


def _assert_close(a, b, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


class TestLinks:
    ETA = np.linspace(-4.0, 4.0, 41)

    def test_identity(self):
        _assert_close(get_link("identity").linkinv(self.ETA), self.ETA)

    def test_log(self):
        _assert_close(get_link("log").linkinv(self.ETA), np.exp(self.ETA))

    def test_logit(self):
        _assert_close(get_link("logit").linkinv(self.ETA), expit(self.ETA))

    def test_probit(self):
        _assert_close(get_link("probit").linkinv(self.ETA), st.norm.cdf(self.ETA), rtol=1e-5)

    def test_cloglog(self):
        expected = 1.0 - np.exp(-np.exp(self.ETA))
        got = get_link("cloglog").linkinv(jnp.asarray(self.ETA))
        _assert_close(got, np.clip(expected, 1e-15, 1 - 1e-15), rtol=1e-5)

    def test_cauchit(self):
        _assert_close(get_link("cauchit").linkinv(self.ETA), st.cauchy.cdf(self.ETA))

    def test_roundtrip(self):
        mu = np.linspace(0.02, 0.98, 20)
        for name in ["logit", "probit", "cloglog", "cauchit"]:
            link = get_link(name)
            _assert_close(link.linkinv(jnp.asarray(link.link(jnp.asarray(mu)))), mu, rtol=1e-4)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_link("nope")


class TestLogDensities:
    """Each family's log_density(mu, y) vs the scipy closed form — the
    analogue of R's dnorm/dbinom/dpois/dnbinom (R/glm_utils.R:40-57)."""

    def test_gaussian(self):
        y = np.array([-1.0, 0.3, 2.5])
        mu = np.array([0.0, 0.5, 2.0])
        fam = gaussian()
        got = fam.log_density_mu(jnp.asarray(mu), jnp.asarray(y), {"sd": 1.7})
        _assert_close(got, st.norm.logpdf(y, mu, 1.7))

    def test_bernoulli(self):
        y = np.array([0.0, 1.0, 1.0, 0.0])
        mu = np.array([0.2, 0.7, 0.01, 0.99])
        got = binomial().log_density_mu(jnp.asarray(mu), jnp.asarray(y), {})
        _assert_close(got, st.bernoulli.logpmf(y.astype(int), mu))

    def test_poisson(self):
        y = np.array([0.0, 1.0, 5.0, 12.0])
        mu = np.array([0.5, 1.0, 4.0, 15.0])
        got = poisson().log_density_mu(jnp.asarray(mu), jnp.asarray(y), {})
        _assert_close(got, st.poisson.logpmf(y.astype(int), mu))

    def test_negative_binomial_size1(self):
        # reference parity: dnbinom(Y, size=1, mu=mu) (R/glm_utils.R:55-57)
        y = np.array([0.0, 1.0, 3.0, 9.0])
        mu = np.array([0.5, 1.0, 2.0, 5.0])
        r = 1.0
        p = r / (r + mu)
        got = negative_binomial().log_density_mu(jnp.asarray(mu), jnp.asarray(y), {})
        _assert_close(got, st.nbinom.logpmf(y.astype(int), r, p))

    def test_negative_binomial_size3(self):
        y = np.array([0.0, 2.0, 7.0])
        mu = np.array([1.0, 2.0, 4.0])
        r = 3.0
        p = r / (r + mu)
        got = negative_binomial().log_density_mu(
            jnp.asarray(mu), jnp.asarray(y), {"size": 3.0}
        )
        _assert_close(got, st.nbinom.logpmf(y.astype(int), r, p))

    def test_gamma(self):
        y = np.array([0.5, 1.2, 3.0])
        mu = np.array([1.0, 2.0, 1.5])
        k = 2.5
        got = gamma().log_density_mu(jnp.asarray(mu), jnp.asarray(y), {"shape": k})
        _assert_close(got, st.gamma.logpdf(y, k, scale=mu / k), rtol=1e-5)

    def test_inverse_gaussian(self):
        y = np.array([0.5, 1.0, 2.5])
        mu = np.array([1.0, 1.5, 2.0])
        # statmod parametrisation with dispersion phi: scipy's invgauss has
        # scale mixing: invgauss(mu/lam, scale=lam) where lam = 1/phi.
        phi = 0.5
        lam = 1.0 / phi
        expected = st.invgauss.logpdf(y, mu / lam, scale=lam)
        got = inverse_gaussian().log_density_mu(
            jnp.asarray(mu), jnp.asarray(y), {"dispersion": phi}
        )
        _assert_close(got, expected, rtol=1e-5)


class TestEtaFusedPaths:
    """The fused log_density_eta paths must agree with linkinv+log_density."""

    ETA = np.linspace(-5.0, 5.0, 31)

    @pytest.mark.parametrize(
        "fam,link,y",
        [
            (gaussian, "identity", np.linspace(-2, 2, 31)),
            (binomial, "logit", (np.arange(31) % 2).astype(float)),
            (binomial, "probit", (np.arange(31) % 2).astype(float)),
            (binomial, "cloglog", (np.arange(31) % 2).astype(float)),
            (poisson, "log", np.arange(31).astype(float) % 7),
            (negative_binomial, "log", np.arange(31).astype(float) % 5),
            (gamma, "log", np.linspace(0.2, 4.0, 31)),
        ],
    )
    def test_fused_matches_composed(self, fam, link, y):
        f = fam(link=link)
        eta_np = self.ETA
        if link == "cloglog":
            # the composed path saturates once 1-mu underflows (exp(-e^eta));
            # the fused path is exact there, so compare on the stable range
            eta_np = np.clip(eta_np, -5.0, 2.5)
        eta = jnp.asarray(eta_np)
        yj = jnp.asarray(y)
        fused = f.log_density_eta(eta, yj, {})
        composed = f.log_density_mu(f.linkinv(eta), yj, {})
        _assert_close(fused, composed, rtol=1e-5, atol=1e-5)


class TestCheckFamily:
    def test_string(self):
        assert check_family("gaussian").name == "gaussian"

    def test_factory(self):
        assert check_family(poisson).name == "poisson"

    def test_instance_passthrough(self):
        fam = binomial(link="probit")
        assert check_family(fam) is fam

    def test_unknown(self):
        with pytest.raises(ValueError, match="not recognized"):
            check_family("weird")


class TestRelativeLogDensities:
    """log_density_eta_rel must equal log_density_eta up to a per-
    observation constant that does not depend on eta — i.e. DIFFERENCES
    across eta values agree exactly (the only thing the samplers use).
    The rel forms drop lgamma/log(y) terms, which is what makes
    poisson/negbin/gamma Pallas batteries lowerable (Mosaic has no
    lgamma) and cheaper everywhere."""

    CASES = [
        ("gaussian", "identity", {"sd": 1.3}, "gaussian"),
        ("binomial", "logit", {}, "binomial"),
        ("binomial", "cloglog", {}, "binomial"),
        ("poisson", "log", {}, "poisson"),
        ("negative.binomial", "log", {"size": 2.0}, "negbin"),
        ("Gamma", "log", {"shape": 2.0}, "gamma"),
        ("inverse.gaussian", "log", {"dispersion": 0.5}, "invgauss"),
    ]

    @pytest.mark.parametrize("fam_name,link,extra,resp", CASES)
    def test_differences_match_absolute(self, fam_name, link, extra, resp):
        from mcmcglm_tpu.models.families import check_family

        fam = check_family(fam_name).with_link(link)
        rng = np.random.default_rng(0)
        n = 64
        y = {
            "gaussian": rng.normal(size=n),
            "binomial": rng.binomial(1, 0.5, n).astype(float),
            "poisson": rng.poisson(2.0, n).astype(float),
            "negbin": rng.poisson(2.0, n).astype(float),
            "gamma": rng.gamma(2.0, 1.0, n),
            "invgauss": rng.wald(1.0, 2.0, n),
        }[resp]
        eta1 = jnp.asarray(rng.normal(size=n) * 0.5)
        eta2 = jnp.asarray(rng.normal(size=n) * 0.5)
        d_abs = np.asarray(
            fam.log_density_eta(eta1, y, extra) - fam.log_density_eta(eta2, y, extra)
        )
        d_rel = np.asarray(
            fam.log_density_eta_rel(eta1, y, extra)
            - fam.log_density_eta_rel(eta2, y, extra)
        )
        np.testing.assert_allclose(d_rel, d_abs, rtol=1e-10, atol=1e-10)

    def test_rel_falls_back_to_absolute(self):
        """A family with no rel registration returns the absolute form."""
        from mcmcglm_tpu.models.families import Family
        from mcmcglm_tpu.models.links import get_link

        f = Family(name="custom", link=get_link("identity"),
                   log_density=lambda mu, y, e: -0.5 * (y - mu) ** 2)
        y = np.ones(4)
        eta = jnp.zeros(4)
        np.testing.assert_array_equal(
            np.asarray(f.log_density_eta_rel(eta, y)),
            np.asarray(f.log_density_eta(eta, y)),
        )
