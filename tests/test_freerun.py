"""Tests for the lockstep-free automaton engine (freerun.py).

The engine must be *distributionally identical* to the scan/while CGGibbs
engine — same per-chain algorithm, different cross-chain scheduling — so
the tests are posterior-recovery checks against analytic posteriors and
against the reference engine (the validation strategy of the reference
package: known-truth simulation + the conjugate normal-normal oracle,
SURVEY.md §4).
"""

import numpy as np
import jax
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.freerun import FreeRunCGGibbs
from mcmcglm_tpu.datagen import generate_glm_data


def _gaussian_problem(n=400, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta_true = np.linspace(1.0, -0.5, d)
    y = X @ beta_true + rng.normal(size=n)
    # analytic posterior under N(0,1) iid prior, sd=1 noise
    P = X.T @ X + np.eye(d)
    mu = np.linalg.solve(P, X.T @ y)
    sd = np.sqrt(np.diag(np.linalg.inv(P)))
    return X, y, mu, sd


@pytest.mark.parametrize("shrink_only", [True, False])
def test_gaussian_conjugate_recovery(shrink_only):
    X, y, mu, sd = _gaussian_problem()
    d = X.shape[1]
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        extra={"sd": 1.0}, tuning={"w": 0.7}, shrink_only=shrink_only,
    )
    st = fr.init(jax.random.key(1), 16)
    st, _, _ = fr.warmup(st, 100)
    st, draws, _ = fr.run(st, 400)
    post = np.asarray(draws)[:, 100:, :].reshape(-1, d)
    assert np.abs(post.mean(0) - mu).max() < 0.02
    assert np.abs(post.std(0) / sd - 1.0).max() < 0.08


def test_matches_cggibbs_binomial():
    X, y, _ = generate_glm_data("binomial", n=500, d=6, seed=3)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 6)
    fr = FreeRunCGGibbs(X, y, "binomial", pr, tuning={"w": 0.5})
    b1, _, _ = fr.sample(jax.random.key(2), 500, n_chains=8)
    eng = mg.CGGibbs(X, y, "binomial", pr, tuning={"w": 0.5})
    b2, _, _ = eng.sample(jax.random.key(2), 500, n_chains=8)
    p1 = b1[:, 150:, :].reshape(-1, 6)
    p2 = b2[:, 150:, :].reshape(-1, 6)
    assert np.abs(p1.mean(0) - p2.mean(0)).max() < 0.05
    assert np.abs(p1.std(0) / p2.std(0) - 1.0).max() < 0.15


def test_adapted_widths_cut_eval_count():
    X, y, mu, sd = _gaussian_problem(n=300, d=5, seed=1)
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 5),
        extra={"sd": 1.0}, tuning={"w": 5.0},  # badly oversized
    )
    st = fr.init(jax.random.key(0), 8)
    st, _, _ = fr.warmup(st, 80)
    nev0 = np.asarray(st.nev).copy()
    st, _, nev = fr.run(st, 100)
    # run() returns cumulative per-sweep eval counts (C, n_sweeps)
    nev = np.asarray(nev)
    assert nev.shape == (8, 100)
    per_sweep = np.diff(np.concatenate([nev0[:, None], nev], axis=1), axis=1)
    assert (per_sweep > 0).all()  # honest per-sweep data, not a flat average
    assert per_sweep.std() > 0
    per_coord = per_sweep.mean() / 5
    # shrink-only with adapted widths (default adapt_c=40): ~3-4 evals per
    # coordinate regardless of how badly the initial w was sized
    assert per_coord < 6.0


def test_mvn_and_stacked_priors():
    X, y, _, _ = _gaussian_problem(n=300, d=3, seed=2)
    cov = np.array([[1.0, 0.3, 0.0], [0.3, 1.0, 0.0], [0.0, 0.0, 2.0]])
    for prior in [
        mg.MVNPrior(np.zeros(3), cov),
        mg.StackedPrior([mg.Normal(0, 1), mg.Normal(1, 2), mg.Exponential(1.0)]),
    ]:
        fr = FreeRunCGGibbs(
            X, y, "gaussian", prior, extra={"sd": 1.0}, tuning={"w": 0.7}
        )
        st = fr.init(jax.random.key(3), 4)
        st, draws, _ = fr.run(st, 60)
        assert np.isfinite(np.asarray(draws)).all()


def test_obs_weights():
    X, y, _, _ = _gaussian_problem(n=200, d=3, seed=4)
    w = np.ones(200)
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
        extra={"sd": 1.0}, tuning={"w": 0.7}, obs_weights=w,
    )
    st = fr.init(jax.random.key(0), 4)
    st, draws, _ = fr.run(st, 50)
    assert np.isfinite(np.asarray(draws)).all()


def test_api_engine_freerun_and_auto():
    X, y, mu, sd = _gaussian_problem(n=500, d=3, seed=5)
    fit = mg.mcmcglm(
        X=X, y=y, family="gaussian", n_samples=400, burnin=100,
        n_chains=8, seed=0, engine="freerun", w=0.7,
    )
    assert np.abs(np.asarray(fit.coef()) - mu).max() < 0.03
    # auto must resolve to freerun for the hot config and give the same draws
    fit2 = mg.mcmcglm(
        X=X, y=y, family="gaussian", n_samples=400, burnin=100,
        n_chains=8, seed=0, engine="auto", w=0.7,
    )
    np.testing.assert_allclose(fit.beta, fit2.beta)


def test_api_engine_freerun_validation():
    X, y, _, _ = _gaussian_problem(n=100, d=3, seed=6)
    with pytest.raises(ValueError, match="freerun"):
        mg.mcmcglm(
            X=X, y=y, family="gaussian", n_samples=50, burnin=10,
            engine="freerun", linear_predictor_calc="naive", w=0.5,
        )


def test_run_continuation_mid_sweep():
    """Chains free-run across run() calls; draws stay one sweep apart."""
    X, y, mu, sd = _gaussian_problem(n=300, d=4, seed=7)
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 4),
        extra={"sd": 1.0}, tuning={"w": 0.7},
    )
    st = fr.init(jax.random.key(1), 8)
    st, d1, _ = fr.run(st, 40)
    st, d2, _ = fr.run(st, 40)
    both = np.concatenate([np.asarray(d1), np.asarray(d2)], axis=1)
    post = both[:, 30:, :].reshape(-1, 4)
    assert np.abs(post.mean(0) - mu).max() < 0.06


def test_eval_cache_modes_recover_same_posterior():
    """eval_cache="scalar" (3 HBM streams/pass) and "per_obs" (exact
    relative differences) are the same kernel up to f32 reduction roundoff
    far below the Exp(1) slice level — both must recover the conjugate
    posterior."""
    X, y, mu, sd = _gaussian_problem(n=300, d=4, seed=8)
    for mode in ("scalar", "per_obs"):
        fr = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 4),
            extra={"sd": 1.0}, tuning={"w": 0.7}, eval_cache=mode,
        )
        assert fr.eval_cache == mode
        st = fr.init(jax.random.key(5), 16)
        st, _, _ = fr.warmup(st, 80)
        st, draws, _ = fr.run(st, 300)
        post = np.asarray(draws)[:, 60:, :].reshape(-1, 4)
        assert np.abs(post.mean(0) - mu).max() < 0.03, mode
        assert np.abs(post.std(0) / sd - 1.0).max() < 0.10, mode


def test_eval_cache_auto_resolution():
    """auto -> scalar when f32 reduction roundoff is negligible on the
    slice log scale; -> per_obs when the log-likelihood magnitude makes
    full-sum comparisons unsafe (e.g. a near-degenerate gaussian noise
    scale blows |log density| up to ~1/sd^2)."""
    X, y, _, _ = _gaussian_problem(n=400, d=3, seed=9)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 3)
    fr = FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1.0},
                        tuning={"w": 0.7})
    assert fr.eval_cache == "scalar"
    fr2 = FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1e-4},
                         tuning={"w": 0.7})
    assert fr2.eval_cache == "per_obs"
    with pytest.raises(ValueError, match="eval_cache"):
        FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1.0},
                       tuning={"w": 0.7}, eval_cache="bogus")


def test_run_thinned_moment_merge_exact():
    """At thin=1 every draw is kept, so the streamed Welford moments must
    equal numpy moments computed over the returned draws.  (Bitwise
    cross-chunking equality with run() does NOT hold by design: lanes that
    finish their sweep quota early keep consuming the shared per-pass key
    stream until the slowest lane finishes, so chunk boundaries re-align
    the PRNG — equality across chunkings is distributional only, as for
    chunked run(); see test_run_thinned_recovers_posterior.)"""
    X, y, mu, sd = _gaussian_problem(n=300, d=4, seed=10)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 4)
    fr = FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1.0},
                        tuning={"w": 0.7})
    st0 = fr.init(jax.random.key(11), 8)
    st0, _, _ = fr.warmup(st0, 30)

    st, mom, kept, nev = fr.run_thinned(st0, n_outer=12, thin=1)
    da = np.asarray(kept)  # (C, 12, d): all draws
    np.testing.assert_array_equal(np.asarray(st.beta), da[:, -1])
    np.testing.assert_allclose(np.asarray(mom.count), 12.0)
    np.testing.assert_allclose(np.asarray(mom.mean), da.mean(axis=1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(mom.m2),
        ((da - da.mean(axis=1, keepdims=True)) ** 2).sum(axis=1),
        rtol=1e-5, atol=1e-7,
    )
    assert np.asarray(nev).min() > 0


def test_run_thinned_recovers_posterior():
    """Thinned collection + streamed moments recover the analytic conjugate
    posterior (moments see every sweep, kept draws every thin-th)."""
    X, y, mu, sd = _gaussian_problem(n=300, d=4, seed=11)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 4)
    fr = FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1.0},
                        tuning={"w": 0.7})
    st = fr.init(jax.random.key(12), 16)
    st, _, _ = fr.warmup(st, 100)
    st, mom, kept, _ = fr.run_thinned(st, n_outer=150, thin=3)
    from mcmcglm_tpu.parallel.pooled import ChainMoments, pooled_summary
    summ = pooled_summary(ChainMoments(mom.count[0], mom.mean, mom.m2))
    assert np.abs(np.asarray(summ["mean"]) - mu).max() < 0.03
    assert np.abs(np.sqrt(np.asarray(summ["var"])) / sd - 1.0).max() < 0.12
    assert float(np.max(np.asarray(summ["rhat"]))) < 1.05
    post = np.asarray(kept).reshape(-1, 4)
    assert np.abs(post.mean(0) - mu).max() < 0.04


def test_run_thinned_chunked_accumulation():
    """Passing moments back in across chunked run_thinned calls continues
    the same accumulation (the pod-scale chunked dispatch pattern)."""
    X, y, _, _ = _gaussian_problem(n=200, d=3, seed=12)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 3)
    fr = FreeRunCGGibbs(X, y, "gaussian", pr, extra={"sd": 1.0},
                        tuning={"w": 0.7})
    st = fr.init(jax.random.key(13), 4)
    st, mom, k1, _ = fr.run_thinned(st, n_outer=3, thin=2)
    st, mom, k2, _ = fr.run_thinned(st, n_outer=3, thin=2, moments=mom)
    assert float(np.asarray(mom.count)[0]) == 12.0
    from mcmcglm_tpu.parallel.pooled import ChainMoments, pooled_summary
    summ = pooled_summary(ChainMoments(mom.count[0], mom.mean, mom.m2))
    assert np.isfinite(np.asarray(summ["rhat"])).all()
    assert np.isfinite(np.asarray(summ["mean"])).all()
