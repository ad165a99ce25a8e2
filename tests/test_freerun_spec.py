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
        rates.append((np.asarray(nev)[:, -1] - nev0).mean() / (200 * 12))
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
                eval_cache="scalar", battery_impl=impl, adapt_c=40.0,
            )
            st = fr.init(jax.random.key(0), 16)
            st, _, _ = fr.warmup(st, 60)
            nev0 = np.asarray(st.nev).copy()
            st, draws, nev = fr.run(st, 250)
            posts.append(np.asarray(draws)[:, 60:, :].reshape(-1, 6))
            rates.append((np.asarray(nev)[:, -1] - nev0).mean() / (250 * 6))
        assert abs(rates[0] - rates[1]) / rates[0] < 0.06
        assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.06
        assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.15


class TestBatteryPaddingSafety:
    """ADVICE round-2 high finding: the battery pads the observation axis,
    and gamma/inverse-gaussian log densities contain log(y) terms that are
    NaN/-inf at a padded y=0 — with multiplicative masking (0 * NaN = NaN)
    every slice comparison went NaN and chains silently froze at init.
    The fix pads y with 1.0 and masks by selection; these tests pin it."""

    def _gamma_problem(self, n=300, d=4, seed=0):
        # n chosen NOT lane-aligned so the battery genuinely pads (300->512)
        rng = np.random.default_rng(seed)
        X = np.column_stack(
            [np.ones(n), rng.normal(size=(n, d - 1)) / np.sqrt(d - 1)]
        )
        beta_true = np.linspace(0.8, -0.4, d)
        mu = np.exp(X @ beta_true)
        y = rng.gamma(shape=2.0, scale=mu / 2.0)
        return X, y, beta_true

    def test_gamma_battery_padding_no_nan_freeze(self):
        from mcmcglm_tpu.models.families import gamma

        X, y, beta_true = self._gamma_problem()
        d = X.shape[1]
        fr = FreeRunCGGibbs(
            X, y, gamma("log"), mg.IIDPrior(mg.Normal(0.0, 2.0), d),
            extra={"shape": 2.0}, tuning={"w": 0.5}, spec_k=4,
            eval_cache="scalar", battery_impl="pallas2",
        )
        st = fr.init(jax.random.key(0), 16)
        init_beta = np.asarray(st.beta).copy()
        st, _, _ = fr.warmup(st, 40)
        st, draws, _ = fr.run(st, 150)
        draws = np.asarray(draws)
        assert np.isfinite(draws).all()
        # chains actually moved (the bug froze them bitwise at init)
        assert np.abs(draws[:, -1, :] - init_beta).max() > 0.01
        post = draws[:, 50:, :].reshape(-1, d)
        assert np.abs(post.mean(0) - beta_true).max() < 0.25

    def test_gamma_battery_matches_xla_posterior(self):
        """pallas battery vs the (unpadded) XLA battery on the same gamma
        problem: agreeing posteriors prove the padded slots truly drop out."""
        from mcmcglm_tpu.models.families import gamma

        X, y, _ = self._gamma_problem()
        d = X.shape[1]
        posts = []
        for impl in ("xla", "pallas"):
            fr = FreeRunCGGibbs(
                X, y, gamma("log"), mg.IIDPrior(mg.Normal(0.0, 2.0), d),
                extra={"shape": 2.0}, tuning={"w": 0.5}, spec_k=4,
                eval_cache="scalar", battery_impl=impl, adapt_c=40.0,
            )
            st = fr.init(jax.random.key(3), 16)
            st, _, _ = fr.warmup(st, 60)
            st, draws, _ = fr.run(st, 250)
            posts.append(np.asarray(draws)[:, 80:, :].reshape(-1, d))
        assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.08
        assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.2

    def test_invgauss_battery_padding_no_nan(self):
        """inverse-gaussian with the default 1/mu^2 link: linkinv(0) = inf
        at padded slots — only selection masking survives this."""
        from mcmcglm_tpu.models.families import inverse_gaussian

        rng = np.random.default_rng(1)
        n, d = 200, 3
        X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
        y = rng.wald(mean=1.0, scale=2.0, size=n)
        fr = FreeRunCGGibbs(
            X, y, inverse_gaussian("log"), mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            extra={"dispersion": 0.5}, tuning={"w": 0.5}, spec_k=4,
            eval_cache="scalar", battery_impl="pallas",
        )
        st = fr.init(jax.random.key(0), 8)
        st, _, _ = fr.warmup(st, 30)
        st, draws, _ = fr.run(st, 60)
        assert np.isfinite(np.asarray(draws)).all()


class TestBattery2VmemGate:
    """ADVICE round-2 medium finding: _battery2_fn keeps whole (BC, n_pad)
    rows VMEM-resident; large-n problems must fall back to the n-tiled
    battery instead of failing at Mosaic compile time."""

    def test_large_n_falls_back_to_tiled_battery(self):
        n, d = 60_000, 4  # n_pad 61440: (6*8+4)*n_pad*4 = 12.8 MB > budget
        rng = np.random.default_rng(0)
        X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
        y = rng.binomial(1, 0.5, size=n).astype(np.float64)
        fr = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
            battery_impl="pallas2",
        )
        assert fr._battery2_fn(16) is None  # VMEM gate rejects
        assert fr._battery_fn(16) is not None  # chain falls to n-tiled
        # small n keeps the fused-commit kernel
        frs = FreeRunCGGibbs(
            X[:2000], y[:2000], "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
            battery_impl="pallas2",
        )
        assert frs._battery2_fn(16) is not None

    def test_fallback_chain_runs_end_to_end(self):
        """battery_impl='pallas2' with a VMEM-overflowing n must still
        sample (through the n-tiled battery), not crash."""
        n, d = 60_000, 3
        rng = np.random.default_rng(2)
        X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
        beta_true = np.array([0.5, -0.3, 0.2])
        y = rng.binomial(
            1, 1.0 / (1.0 + np.exp(-X @ beta_true))
        ).astype(np.float64)
        fr = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
            battery_impl="pallas2",
        )
        st = fr.init(jax.random.key(0), 8)
        st, _, _ = fr.warmup(st, 5)
        st, draws, _ = fr.run(st, 10)
        assert np.isfinite(np.asarray(draws)).all()


def test_warmup_passes_bitwise_matches_warmup():
    """The pass-bounded warmup (pod-scale dispatch mode) executes the exact
    same pass sequence as one monolithic warmup call: final state bitwise
    identical, regardless of how the pass budget slices the run."""
    X, y, _ = generate_glm_data("binomial", n=400, d=6, seed=5)
    d = X.shape[1]

    def make():
        return FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4,
        )

    fr1 = make()
    st1 = fr1.init(jax.random.key(7), 8)
    st1, _, _ = fr1.warmup(st1, 20)

    fr2 = make()
    st2 = fr2.init(jax.random.key(7), 8)
    sc = jax.numpy.zeros((8,), jax.numpy.int32)
    for _ in range(10_000):
        st2, sc = fr2.warmup_passes(st2, sc, 20, 37)
        if (np.asarray(sc) >= 20).all():
            break
    else:
        raise AssertionError("warmup_passes never completed")
    assert np.array_equal(np.asarray(st1.beta), np.asarray(st2.beta))
    assert np.array_equal(np.asarray(st1.logw), np.asarray(st2.logw))
    assert np.array_equal(np.asarray(st1.nev), np.asarray(st2.nev))
    assert np.array_equal(
        np.asarray(jax.random.key_data(st1.key)),
        np.asarray(jax.random.key_data(st2.key)),
    )


class TestPallas3InKernelGather:
    """The 3-stream battery: in-kernel X^T row gather via scalar-prefetch
    index_map over the (d, S, 128) layout + fused eta commit (pallas3)."""

    def test_pallas3_matches_xla_battery_in_law(self):
        X, y, _ = generate_glm_data("binomial", n=500, d=6, seed=3)
        pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 6)
        posts, rates = [], []
        for impl in ("xla", "pallas3"):
            fr = FreeRunCGGibbs(
                X, y, "binomial", pr, tuning={"w": 0.5}, spec_k=4,
                eval_cache="scalar", battery_impl=impl, adapt_c=40.0,
            )
            st = fr.init(jax.random.key(0), 16)
            if impl == "pallas3":
                # eta carried in the (C, S, 128) kernel layout
                assert st.eta.shape == (16, 4, 128)
            st, _, _ = fr.warmup(st, 60)
            nev0 = np.asarray(st.nev).copy()
            st, draws, nev = fr.run(st, 250)
            posts.append(np.asarray(draws)[:, 60:, :].reshape(-1, 6))
            rates.append((np.asarray(nev)[:, -1] - nev0).mean() / (250 * 6))
        assert abs(rates[0] - rates[1]) / rates[0] < 0.06
        assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.06
        assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.15

    def test_pallas3_odd_chain_count_and_padding(self):
        """grid=(C,) has no chain-count constraint (battery2 would reject
        C=12); n=300 pads to 512 so the padded-slot masking is exercised."""
        X, y, _ = generate_glm_data("binomial", n=300, d=5, seed=1)
        fr = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 5),
            tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
            battery_impl="pallas3",
        )
        st = fr.init(jax.random.key(0), 12)
        st, _, _ = fr.warmup(st, 30)
        st, draws, _ = fr.run(st, 80)
        assert np.isfinite(np.asarray(draws)).all()

    def test_pallas3_n_budget_rejected_loudly(self):
        n = 1_600_000  # n_pad * 8 * 4 bytes > 12 MB per-step budget
        X = np.ones((n, 2), np.float32)
        y = np.zeros(n, np.float32)
        with pytest.raises(ValueError, match="pallas3.*budget"):
            FreeRunCGGibbs(
                X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 2),
                tuning={"w": 0.5}, spec_k=4, eval_cache="scalar",
                battery_impl="pallas3",
            )


def test_poisson_battery_matches_xla_in_law():
    """Poisson through the Pallas battery (possible only via the relative
    log density — Mosaic cannot lower lgamma(y+1)); eval counts and
    posterior must match the XLA battery."""
    X, y, _ = generate_glm_data("poisson", n=500, d=5, seed=2)
    pr = mg.IIDPrior(mg.Normal(0.0, 1.0), 5)
    posts, rates = [], []
    for impl in ("xla", "pallas3"):
        fr = FreeRunCGGibbs(
            X, y, "poisson", pr, tuning={"w": 0.3}, spec_k=4,
            eval_cache="scalar", battery_impl=impl, adapt_c=40.0,
        )
        st = fr.init(jax.random.key(0), 16)
        st, _, _ = fr.warmup(st, 60)
        nev0 = np.asarray(st.nev).copy()
        st, draws, nev = fr.run(st, 250)
        posts.append(np.asarray(draws)[:, 60:, :].reshape(-1, 5))
        rates.append((np.asarray(nev)[:, -1] - nev0).mean() / (250 * 5))
    assert abs(rates[0] - rates[1]) / rates[0] < 0.06
    assert np.abs(posts[0].mean(0) - posts[1].mean(0)).max() < 0.06
    assert np.abs(posts[0].std(0) / posts[1].std(0) - 1.0).max() < 0.15


class TestBf16XStorage:
    """x_storage='bf16': the design matrix is rounded ONCE up front and
    every path computes on the same rounded values, so the engine exactly
    samples the posterior of X' = bf16(X) — and the pallas3 battery ships
    the halved X-row stream.  These tests pin (a) the posterior shift
    from the design rounding is far below the posterior sd, (b) the
    rounding is applied consistently (eta matches X' beta, not X beta)."""

    def _problem(self, n=1000, d=8, seed=0):
        rng = np.random.default_rng(seed)
        X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
        beta_true = rng.normal(size=d) * 0.5
        y = rng.binomial(1, 1.0 / (1.0 + np.exp(-X @ beta_true))).astype(float)
        return X, y

    def _fit(self, X, y, x_storage, seed=3):
        d = X.shape[1]
        fr = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4, battery_impl="pallas3",
            x_storage=x_storage,
        )
        st = fr.init(jax.random.key(seed), 16)
        st, _, _ = fr.warmup(st, 40)
        st, draws, _ = fr.run(st, 300)
        return np.asarray(draws)[:, 50:, :].reshape(-1, d)

    def test_posterior_shift_below_sd(self):
        X, y = self._problem()
        p32 = self._fit(X, y, "f32")
        p16 = self._fit(X, y, "bf16")
        sd = p32.std(0)
        shift = np.abs(p16.mean(0) - p32.mean(0)) / sd
        # the X' perturbation is ~2^-9 relative; the induced posterior
        # shift must drown in the posterior spread (MC error here ~0.05)
        assert shift.max() < 0.2

    def test_eta_consistent_with_rounded_design(self):
        X, y = self._problem(n=600, d=6)
        d = X.shape[1]
        fr = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4, battery_impl="pallas3",
            x_storage="bf16",
        )
        st = fr.init(jax.random.key(0), 8)
        st, _, _ = fr.run(st, 3)
        n_pad = int(np.prod(fr.Xt.shape[1:]))
        eta = np.asarray(st.eta).reshape(8, n_pad)[:, :fr.n]
        Xp = np.asarray(X).astype(np.float32)
        import jax.numpy as jnp
        Xr = np.asarray(jnp.asarray(Xp).astype(jnp.bfloat16).astype(jnp.float32))
        # eta must track the ROUNDED design exactly (f32 accumulation of
        # incremental updates), not the original X
        drift_rounded = np.abs(
            eta - np.asarray(st.beta) @ np.asarray(Xr).T
        ).max()
        assert drift_rounded < 5e-4

    def test_bad_x_storage_raises(self):
        X, y = self._problem(n=200, d=4)
        with pytest.raises(ValueError, match="x_storage"):
            FreeRunCGGibbs(
                X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 4),
                tuning={"w": 0.5}, x_storage="fp8",
            )


def test_commit_row_equals_scatter_semantics():
    """_commit_row (the one-hot dense select that replaced the serialised
    TPU scatter) must be element-for-element the scatter it replaced,
    including the gated form (only gated lanes write)."""
    import jax.numpy as jnp

    X, y, _ = generate_glm_data("binomial", n=200, d=7, seed=0)
    fr = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 7),
        tuning={"w": 0.5},
    )
    rng = np.random.default_rng(5)
    C, d = 9, 7
    arr = jnp.asarray(rng.normal(size=(C, d)).astype(np.float32))
    j = jnp.asarray(rng.integers(0, d, size=C), jnp.int32)
    val = jnp.asarray(rng.normal(size=C).astype(np.float32))
    gate = jnp.asarray(rng.integers(0, 2, size=C).astype(bool))

    rows = jnp.arange(C)
    want_plain = arr.at[rows, j].set(val)
    got_plain = fr._commit_row(arr, j, val)
    assert np.array_equal(np.asarray(want_plain), np.asarray(got_plain))

    jw = jnp.where(gate, j, d)  # the old OOB-drop gating
    want_gated = arr.at[rows, jw].set(val, mode="drop")
    got_gated = fr._commit_row(arr, j, val, gate=gate)
    assert np.array_equal(np.asarray(want_gated), np.asarray(got_gated))


def test_idle_lanes_do_not_burn_shrink_budget_across_boundaries():
    """Regression (round-4 pod anomaly, results/round4_pod_diag.log):
    after a chain fills its sweep quota it idles while slower chains
    finish; its automaton must FREEZE — previously the idle lane kept
    shrinking its interval and burning its shrink budget, so at the next
    run boundary it resumed with rem=0 and exhaust-committed b0, skipping
    the first coordinate after the sweep wrap (the intercept) for every
    chain that idled long enough; at pod scale (thin=1, 149 boundaries)
    this FROZE the intercept outright for 43% of 4096 chains.  Provoked
    here with a tiny max_shrink, many chains (long boundary tails
    relative to d) and many one-sweep boundaries; the metric is the
    intercept MOVE RATE across boundaries (pre-fix ~0.45 here; the
    slice draw virtually always moves, so post-fix it must be ~1)."""
    X, y, _ = generate_glm_data("binomial", n=400, d=3, seed=1)
    fr = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
        tuning={"w": 0.5}, spec_k=4, max_shrink=16,
    )
    st = fr.init(jax.random.key(0), 256)
    st, _, _ = fr.warmup(st, 20)
    kept = []
    for _ in range(30):  # 30 one-sweep run boundaries
        st, draws, _ = fr.run(st, 1)
        kept.append(np.asarray(draws))
    col0 = np.concatenate(kept, axis=1)[:, :, 0]  # (C, 30) intercept
    moved = np.abs(np.diff(col0, axis=1)) > 0
    move_rate = float(moved.mean())
    assert move_rate > 0.95, f"intercept move rate {move_rate:.3f}"


def test_idle_lanes_never_saturate_shrink_budget():
    """Mechanism-level invariant for the same regression: the persisted
    n_shrink register can never reach max_shrink — an active lane that
    would reach it exhaust-commits (and resets) within the same pass, and
    idle lanes are frozen.  Pre-fix, idle lanes' n_shrink saturated AT
    max_shrink across run boundaries (the freeze precondition)."""
    X, y, _ = generate_glm_data("binomial", n=400, d=3, seed=1)
    fr = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 3),
        tuning={"w": 0.5}, spec_k=4, max_shrink=8,
    )
    st = fr.init(jax.random.key(0), 256)
    st, _, _ = fr.warmup(st, 10)
    worst = 0
    for _ in range(10):
        st, _, _ = fr.run(st, 1)
        worst = max(worst, int(np.asarray(st.n_shrink).max()))
    assert worst < fr.max_shrink, (
        f"persisted n_shrink reached {worst} (max_shrink {fr.max_shrink}): "
        "idle lanes are burning shrink budget across boundaries"
    )


def test_pass_hlo_scatter_budget():
    """Structural performance guard (like the zero-collective HLO test,
    tests/test_sharding.py): the compiled pass may contain AT MOST the
    two cond-gated sweep-buffer scatters (draws + nevbuf).  The beta and
    logw commits are one-hot dense selects — XLA's TPU scatter lowering
    serialises row updates and cost 20 us/pass before round 4
    (results/round4_pass_budget2.log); reintroducing a per-pass scatter
    would silently regress the pass by ~30%."""
    import re
    from functools import partial

    X, y, _ = generate_glm_data("binomial", n=300, d=6, seed=0)
    fr = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 6),
        tuning={"w": 0.5}, spec_k=4,
    )
    st = fr.init(jax.random.key(0), 8)
    txt = jax.jit(partial(
        fr._run, n_sweeps=2, adapt=True, shrink_only=False,
        stepout_sweeps=1,
    )).lower(st).compile().as_text()
    n_scatter = len(re.findall(r"scatter\(", txt))
    assert n_scatter <= 2, (
        f"{n_scatter} scatter ops in the pass HLO (expected <=2: the "
        "gated draws/nevbuf sweep buffers) — a commit path regressed "
        "to scatter"
    )


def test_run_passes_bitwise_matches_run():
    """The pass-bounded barrier-free collection (run_passes — the pod
    thin=1 mode) executes the exact same pass sequence as run(): final
    state and collected draws bitwise identical, regardless of how the
    pass budget slices the dispatches."""
    X, y, _ = generate_glm_data("binomial", n=400, d=6, seed=5)

    def make():
        return FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 6),
            tuning={"w": 0.5}, spec_k=4,
        )

    fr1 = make()
    st1 = fr1.init(jax.random.key(7), 8)
    st1, _, _ = fr1.warmup(st1, 10)
    st1, draws1, nev1 = fr1.run(st1, 12)

    fr2 = make()
    st2 = fr2.init(jax.random.key(7), 8)
    st2, _, _ = fr2.warmup(st2, 10)
    sc, draws2, nb = None, None, None
    for _ in range(10_000):
        st2, sc, draws2, nb = fr2.run_passes(st2, sc, draws2, nb, 12, 37)
        if (np.asarray(sc) >= 12).all():
            break
    else:
        raise AssertionError("run_passes never completed")
    assert np.array_equal(np.asarray(st1.beta), np.asarray(st2.beta))
    assert np.array_equal(np.asarray(draws1), np.asarray(draws2))
    assert np.array_equal(np.asarray(nev1), np.asarray(nb))


def test_sharded_run_passes_collects_and_mixes():
    """Sharded run_passes over the virtual mesh: draws land in the
    chain-sharded buffer, every chain completes its quota, and the
    intercept mixes (the boundary-freeze regression has no boundaries
    left to bite)."""
    from mcmcglm_tpu.parallel.freerun_sharded import ShardedFreeRunCGGibbs

    X, y, _ = generate_glm_data("binomial", n=400, d=5, seed=2)
    eng = ShardedFreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), 5),
        tuning={"w": 0.5}, spec_k=4,
    )
    st = eng.init(jax.random.key(0), 32)
    st, _, _ = eng.warmup(st, 15)
    sc, draws, nb = None, None, None
    for _ in range(10_000):
        st, sc, draws, nb = eng.run_passes(st, sc, draws, nb, 25, 300)
        if (np.asarray(sc) >= 25).all():
            break
    else:
        raise AssertionError("sharded run_passes never completed")
    dr = np.asarray(draws)
    assert dr.shape == (32, 25, 5)
    assert np.isfinite(dr).all()
    assert (dr[:, :, 0].std(axis=1) > 1e-7).all()  # intercept moves
