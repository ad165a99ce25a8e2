"""Tests for the K-speculative freerun pass (freerun.py::_pass_spec).

The speculative engine must be *identical in law* to the spec_k=1
automaton: it generates the shrinkage all-rejections proposal chain up
front (the interval recursion is deterministic given the uniforms) and
selects the first acceptor, so the committed draw — and the per-coordinate
ALGORITHMIC evaluation count — have exactly the single-proposal kernel's
distribution.  Validation mirrors the reference package's strategy
(known-truth + conjugate oracle, SURVEY.md §4) plus an eval-count
law-equivalence check.
"""

import numpy as np
import jax
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs


def _gaussian_problem(n=400, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta_true = np.linspace(1.0, -0.5, d)
    y = X @ beta_true + rng.normal(size=n)
    P = X.T @ X + np.eye(d)
    mu = np.linalg.solve(P, X.T @ y)
    sd = np.sqrt(np.diag(np.linalg.inv(P)))
    return X, y, mu, sd


@pytest.mark.parametrize("shrink_only", [True, False])
@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_gaussian_conjugate_recovery(shrink_only, spec_k):
    X, y, mu, sd = _gaussian_problem()
    d = X.shape[1]
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        extra={"sd": 1.0}, tuning={"w": 0.7}, shrink_only=shrink_only,
        spec_k=spec_k,
    )
    st = fr.init(jax.random.key(1), 16)
    st, _, _ = fr.warmup(st, 100)
    st, draws, _ = fr.run(st, 400)
    post = np.asarray(draws)[:, 100:, :].reshape(-1, d)
    assert np.abs(post.mean(0) - mu).max() < 0.02
    assert np.abs(post.std(0) / sd - 1.0).max() < 0.08


def test_spec_eval_count_matches_classic_in_law():
    """nev counts algorithmic evaluations; their per-coordinate mean must
    agree between spec_k=1 and spec_k=4 (same kernel, same law)."""
    X, y, _ = generate_glm_data("binomial", n=600, d=12, seed=0)
    rates = []
    for K in (1, 4):
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), 12),
            tuning={"w": 0.5}, spec_k=K,
        )
        st = eng.init(jax.random.key(0), 16)
        st, _, _ = eng.warmup(st, 60)
        nev0 = np.asarray(st.nev).copy()
        st, _, nev = eng.run(st, 200)
        rates.append((np.asarray(nev) - nev0).mean() / (200 * 12))
    assert abs(rates[0] - rates[1]) / rates[0] < 0.05


def test_spec_matches_classic_posterior_binomial():
    X, y, _ = generate_glm_data("binomial", n=500, d=6, seed=3)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 6)
    posts = []
    for K in (1, 4):
        fr = FreeRunCGGibbs(X, y, "binomial", pr, tuning={"w": 0.5}, spec_k=K)
        b, _, _ = fr.sample(jax.random.key(2), 500, n_chains=8)
        posts.append(b[:, 150:, :].reshape(-1, 6))
    p1, p2 = posts
    assert np.abs(p1.mean(0) - p2.mean(0)).max() < 0.05
    assert np.abs(p1.std(0) / p2.std(0) - 1.0).max() < 0.15


def test_spec_per_obs_cache():
    """The per-observation cache path recomputes the committed densities
    (the battery is reduction-fused); posterior must still be exact."""
    X, y, mu, sd = _gaussian_problem(n=300, d=3, seed=2)
    fr = FreeRunCGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
        extra={"sd": 1.0}, tuning={"w": 0.7}, eval_cache="per_obs", spec_k=3,
    )
    st = fr.init(jax.random.key(0), 16)
    st, _, _ = fr.warmup(st, 80)
    st, draws, _ = fr.run(st, 300)
    post = np.asarray(draws)[:, 80:, :].reshape(-1, 3)
    assert np.abs(post.mean(0) - mu).max() < 0.03
    assert np.abs(post.std(0) / sd - 1.0).max() < 0.1


def test_spec_stacked_prior_and_thinned():
    X, y, _, _ = _gaussian_problem(n=300, d=3, seed=2)
    fr = FreeRunCGGibbs(
        X, y, "gaussian",
        mg.StackedPrior([mg.Normal(0, 1), mg.Normal(1, 2), mg.Exponential(1.0)]),
        extra={"sd": 1.0}, tuning={"w": 0.7}, spec_k=4,
    )
    st = fr.init(jax.random.key(3), 4)
    st, mom, draws, _ = fr.run_thinned(st, n_outer=20, thin=2)
    assert np.isfinite(np.asarray(draws)).all()
    assert float(np.asarray(mom.count).min()) == 40.0


def test_spec_k_validation():
    X, y, _, _ = _gaussian_problem(n=100, d=3)
    with pytest.raises(ValueError, match="spec_k"):
        FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
            extra={"sd": 1.0}, tuning={"w": 0.5}, spec_k=0,
        )


class TestPallasBattery:
    """battery_impl='pallas': the one-read Pallas battery eval (interpret
    mode on CPU) must agree with the XLA broadcast formulation numerically
    and produce the same posterior."""

    def test_battery_values_match_xla(self):
        X, y, _ = generate_glm_data("binomial", n=500, d=8, seed=1)
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), 8),
            tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
            battery_impl="pallas",
        )
        assert eng.battery_impl == "pallas"
        C = 16
        rng = np.random.default_rng(0)
        n_pad = int(eng.Xt.shape[1])
        assert n_pad % 256 == 0 and n_pad >= 500
        import jax.numpy as jnp

        eta = jnp.asarray(
            np.where(np.arange(n_pad) < 500,
                     rng.normal(size=(C, n_pad)), 0.0), jnp.float32)
        j = jnp.asarray(rng.integers(0, 8, C), np.int32)
        xg = jnp.take(eng.Xt, j, axis=0)
        deltas = jnp.asarray(0.2 * rng.normal(size=(C, 4)), jnp.float32)

        lsum_pl = np.asarray(eng._battery_fn(C)(eta, xg, deltas))
        e = eta[:, None, :] + xg[:, None, :] * deltas[:, :, None]
        ld = eng.family.log_density_eta(e, eng.y, eng.extra)
        lsum_ref = np.asarray(eng.reduce_fn(ld))
        np.testing.assert_allclose(lsum_pl, lsum_ref, rtol=2e-5, atol=2e-3)

    def test_pallas_posterior_matches_oracle(self):
        X, y, mu, sd = _gaussian_problem(n=400, d=4, seed=0)
        fr = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 4),
            extra={"sd": 1.0}, tuning={"w": 0.7}, spec_k=4,
            eval_cache="scalar", battery_impl="pallas",
        )
        st = fr.init(jax.random.key(1), 16)
        st, _, _ = fr.warmup(st, 100)
        st, draws, _ = fr.run(st, 400)
        post = np.asarray(draws)[:, 100:, :].reshape(-1, 4)
        assert np.abs(post.mean(0) - mu).max() < 0.02
        assert np.abs(post.std(0) / sd - 1.0).max() < 0.08

    def test_pallas_weighted_obs(self):
        """obs_weights fold into the battery's reduction mask."""
        X, y, _, _ = _gaussian_problem(n=300, d=3, seed=2)
        w = np.ones(300); w[:150] = 2.0
        fr_p = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
            extra={"sd": 1.0}, tuning={"w": 0.7}, spec_k=3,
            eval_cache="scalar", battery_impl="pallas", obs_weights=w,
        )
        fr_x = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
            extra={"sd": 1.0}, tuning={"w": 0.7}, spec_k=3,
            eval_cache="scalar", battery_impl="xla", obs_weights=w,
        )
        posts = []
        for fr in (fr_p, fr_x):
            st = fr.init(jax.random.key(0), 8)
            st, _, _ = fr.warmup(st, 60)
            st, draws, _ = fr.run(st, 250)
            posts.append(np.asarray(draws)[:, 60:, :].reshape(-1, 3))
        assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.05
        assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.15

    def test_pallas_validation(self):
        X, y, _, _ = _gaussian_problem(n=100, d=3)
        with pytest.raises(ValueError, match="battery_impl"):
            FreeRunCGGibbs(
                X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
                extra={"sd": 1.0}, tuning={"w": 0.5}, spec_k=1,
                battery_impl="pallas",
            )
        with pytest.raises(ValueError, match="battery_impl"):
            FreeRunCGGibbs(
                X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
                extra={"sd": 1.0}, tuning={"w": 0.5}, spec_k=4,
                battery_impl="nope",
            )


class TestPallas2FusedCommit:
    """battery_impl='pallas2': the 3-stream fused battery + in-kernel eta
    commit (gather by DMA, decision replayed in-kernel).  The outside
    automaton recomputes the same decision from the returned sums, so the
    sampler must remain exact."""

    def test_pallas2_posterior_matches_oracle(self):
        X, y, mu, sd = _gaussian_problem(n=400, d=4, seed=0)
        fr = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0.0, 1.0), 4),
            extra={"sd": 1.0}, tuning={"w": 0.7}, spec_k=4,
            eval_cache="scalar", battery_impl="pallas2",
        )
        assert fr.battery_impl == "pallas2"
        st = fr.init(jax.random.key(1), 16)
        st, _, _ = fr.warmup(st, 100)
        st, draws, _ = fr.run(st, 400)
        post = np.asarray(draws)[:, 100:, :].reshape(-1, 4)
        assert np.abs(post.mean(0) - mu).max() < 0.02
        assert np.abs(post.std(0) / sd - 1.0).max() < 0.08

    def test_pallas2_matches_xla_battery_in_law(self):
        """Same eval counts and agreeing posteriors vs the XLA battery."""
        X, y, _ = generate_glm_data("binomial", n=500, d=6, seed=3)
        pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 6)
        posts, rates = [], []
        for impl in ("xla", "pallas2"):
            fr = FreeRunCGGibbs(
                X, y, "binomial", pr, tuning={"w": 0.5}, spec_k=4,
                eval_cache="scalar", battery_impl=impl,
            )
            st = fr.init(jax.random.key(0), 16)
            st, _, _ = fr.warmup(st, 60)
            nev0 = np.asarray(st.nev).copy()
            st, draws, nev = fr.run(st, 250)
            posts.append(np.asarray(draws)[:, 60:, :].reshape(-1, 6))
            rates.append((np.asarray(nev) - nev0).mean() / (250 * 6))
        assert abs(rates[0] - rates[1]) / rates[0] < 0.06
        assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.06
        assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.15
