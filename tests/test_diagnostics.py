"""Tests for ESS / split-R-hat / summaries against known processes."""

import numpy as np
import pytest

from mcmcglm_tpu.diagnostics import ess, split_rhat, summarize


def ar1(rng, C, K, rho):
    x = np.zeros((C, K))
    innov = rng.normal(size=(C, K)) * np.sqrt(1 - rho**2)
    x[:, 0] = rng.normal(size=C)
    for t in range(1, K):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


class TestESS:
    def test_iid_ess_near_total(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 2000))
        e = ess(x)
        assert 0.7 * 8000 < e <= 8000 * 2

    def test_ar1_matches_theory(self):
        # AR(1) with coefficient rho has tau = (1+rho)/(1-rho)
        rng = np.random.default_rng(1)
        rho = 0.7
        x = ar1(rng, 8, 5000, rho)
        expected = 8 * 5000 * (1 - rho) / (1 + rho)
        got = ess(x)
        assert 0.6 * expected < got < 1.5 * expected

    def test_multiparam_shape(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 500, 3))
        assert ess(x).shape == (3,)


class TestRhat:
    def test_converged_near_one(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(8, 1000))
        assert abs(split_rhat(x) - 1.0) < 0.02

    def test_diverged_chains_flagged(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(4, 500))
        x[0] += 10.0  # one stuck chain far away
        assert split_rhat(x) > 1.5

    def test_within_chain_drift_flagged(self):
        # split-rhat catches trending chains even with a single chain
        x = np.linspace(0, 5, 1000)[None, :] + np.random.default_rng(5).normal(
            size=(1, 1000)
        )
        assert split_rhat(x) > 1.2


class TestSummarize:
    def test_columns_and_values(self):
        rng = np.random.default_rng(6)
        x = rng.normal(loc=[1.0, -2.0], scale=[1.0, 0.5], size=(4, 4000, 2))
        df = summarize(x, columns=["a", "b"])
        assert list(df["var"]) == ["a", "b"]
        np.testing.assert_allclose(df["mean"], [1.0, -2.0], atol=0.05)
        np.testing.assert_allclose(df["q_5"], [1.0, -2.0], atol=0.07)
        assert (df["rhat"] < 1.01).all()
