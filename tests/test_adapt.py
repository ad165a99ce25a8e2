"""Tests for adaptive slice-width warmup (engine.warmup; no counterpart in
the reference — w is a raw tuning parameter there, R/mcmcglm.R:40-41)."""

import jax
import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data


@pytest.fixture(scope="module")
def problem():
    X, y, _ = generate_glm_data("binomial", n=1000, d=20, seed=0)
    return X, y


class TestWarmupAdaptation:
    def test_bad_w_recovers(self, problem):
        """From a pathologically small w the adapted eval count must match
        the well-tuned count within ~30%."""
        X, y = problem
        prior = mg.IIDPrior(mg.Normal(0, 1), 20)

        eng_good = mg.CGGibbs(X, y, "binomial", prior, tuning={"w": 0.5})
        sg = eng_good.init(jax.random.key(0), 8)
        sg, _, _ = eng_good.run(sg, 30)
        sg, _, n_good = eng_good.run(sg, 30)

        eng_bad = mg.CGGibbs(X, y, "binomial", prior, tuning={"w": 0.005})
        sb = eng_bad.init(jax.random.key(0), 8)
        sb, _, _ = eng_bad.warmup(sb, 60)
        sb, _, n_adapted = eng_bad.run(sb, 30)

        good = float(np.asarray(n_good).mean())
        adapted = float(np.asarray(n_adapted).mean())
        assert adapted < 1.5 * good

    def test_posterior_unchanged(self, problem):
        """Frozen-width sampling after warmup must target the same posterior."""
        X, y = problem
        prior = mg.IIDPrior(mg.Normal(0, 1), 20)
        eng_a = mg.CGGibbs(X, y, "binomial", prior, tuning={"w": 0.5})
        sa = eng_a.init(jax.random.key(0), 8)
        sa, _, _ = eng_a.warmup(sa, 50)
        sa, ba, _ = eng_a.run(sa, 200)

        eng_f = mg.CGGibbs(X, y, "binomial", prior, tuning={"w": 0.5})
        sf = eng_f.init(jax.random.key(1), 8)
        sf, _, _ = eng_f.run(sf, 50)
        sf, bf, _ = eng_f.run(sf, 200)

        ma = np.asarray(ba).reshape(-1, 20).mean(0)
        mf = np.asarray(bf).reshape(-1, 20).mean(0)
        np.testing.assert_allclose(ma, mf, atol=0.12)

    def test_api_adapt_flag(self, problem):
        X, y = problem
        fit = mg.mcmcglm(
            family="binomial", X=X, y=y, beta_prior=mg.Normal(0, 1),
            n_samples=150, burnin=50, n_chains=4, adapt_w=True, w=0.01,
        )
        assert fit.beta.shape == (4, 151, 20)
        assert np.isfinite(fit.coef().values).all()

    def test_non_stepping_out_noop(self, problem):
        X, y = problem
        eng = mg.CGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), 20),
            config=mg.EngineConfig(slice_kernel="elliptical"),
            tuning={"mu": 0.0, "sigma": 2.0},
        )
        st = eng.init(jax.random.key(0), 4)
        st, b, _ = eng.warmup(st, 10)  # no-op fallback
        assert np.isfinite(np.asarray(b)).all()

    def test_reset_adaptation(self, problem):
        """warmup() flips the engine into adapted mode; reset_adaptation()
        makes that reversible (round-1 review: one-way instance trap)."""
        X, y = problem
        eng = mg.CGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), 20),
            tuning={"w": 0.5},
        )
        st = eng.init(jax.random.key(0), 4)
        st, _, _ = eng.warmup(st, 20)
        assert eng._w_adapted
        st, b_ad, _ = eng.run(st, 10)
        assert np.isfinite(np.asarray(b_ad)).all()

        eng.reset_adaptation()
        assert not eng._w_adapted
        # fresh un-adapted state samples the static-tuning path again and
        # must produce draws distributed like a never-adapted engine's
        st2 = eng.init(jax.random.key(1), 4)
        st2, b, nev = eng.run(st2, 10)
        assert np.isfinite(np.asarray(b)).all()

        eng_fresh = mg.CGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), 20),
            tuning={"w": 0.5},
        )
        stf = eng_fresh.init(jax.random.key(1), 4)
        stf, bf, nevf = eng_fresh.run(stf, 10)
        np.testing.assert_allclose(np.asarray(b), np.asarray(bf))
        np.testing.assert_array_equal(np.asarray(nev), np.asarray(nevf))
