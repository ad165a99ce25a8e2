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
    per_coord = (np.asarray(nev) - nev0).mean() / (100 * 5)
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
