"""Plumbing tests for the fused Pallas engine.

On CPU the Pallas TPU interpreter executes the kernel but its hardware PRNG
returns zero bits, so the slice sampler degenerates (documented limitation).
These tests therefore validate the *mechanics* that don't depend on RNG
quality — state consistency (eta == X beta after every sweep, which catches
aliasing/commit bugs), padding, and input validation.  Distributional
correctness vs the closed-form posterior runs on real TPU hardware
(tests marked tpu_only; also exercised by bench.py)."""

import jax
import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.fused import FusedCGGibbs

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU PRNG"
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, d = 200, 3  # n=200 pads to 256
    X = np.column_stack([np.ones(n), rng.normal(size=(n, 2))])
    y = rng.normal(X @ np.array([1.0, 1.5, 2.0]), 1.0)
    return X, y


class TestPlumbing:
    def test_eta_stays_consistent(self, problem):
        """After sweeps, carried eta must equal X @ beta exactly for every
        chain — catches kernel aliasing/commit bugs even with degenerate RNG."""
        X, y = problem
        eng = FusedCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        state = eng.init(jax.random.key(0), 8)
        state, betas, _ = eng.run(state, 3)
        beta = np.asarray(state.beta)  # (C, d)
        eta = np.asarray(state.eta)  # (C, n_padded)
        expect = beta @ np.asarray(eng.Xt)
        np.testing.assert_allclose(eta, expect, rtol=1e-4, atol=1e-4)
        # padded tail of eta stays exactly X_pad @ beta = 0 contributions
        assert eta.shape[1] == 256

    def test_sample_shapes(self, problem):
        X, y = problem
        eng = FusedCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        betas, nev, state = eng.sample(jax.random.key(0), 10, n_chains=8)
        assert betas.shape == (8, 11, 3)
        assert nev.shape == (10,)

    def test_validation(self, problem):
        X, y = problem
        prior = mg.IIDPrior(mg.Normal(0, 1), 3)
        with pytest.raises(ValueError, match="IIDPrior"):
            FusedCGGibbs(X, y, "gaussian", mg.MVNPrior(np.zeros(3), np.eye(3)),
                         tuning={"w": 0.5})
        with pytest.raises(ValueError, match="w"):
            FusedCGGibbs(X, y, "gaussian", prior)
        eng = FusedCGGibbs(X, y, "gaussian", prior, extra={"sd": 1.0},
                           tuning={"w": 0.5})
        with pytest.raises(ValueError, match="multiple"):
            eng.init(jax.random.key(0), 5)


@tpu_only
class TestDistributional:
    def test_gaussian_posterior(self, problem):
        X, y = problem
        eng = FusedCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        betas, _, _ = eng.sample(jax.random.key(0), 300, n_chains=32)
        post = betas[:, 101:, :].reshape(-1, 3)
        prec = X.T @ X + np.eye(3)
        mu = np.linalg.solve(prec, X.T @ y)
        sd = np.sqrt(np.diag(np.linalg.inv(prec)))
        np.testing.assert_allclose(post.mean(0), mu, atol=float(6 * sd.max() / 50))
        np.testing.assert_allclose(post.std(0), sd, rtol=0.3)
