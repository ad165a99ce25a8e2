"""Tests for the tuning-parameter sweep and comptime benchmark harnesses
(analogues of R/slice_utilities.R and R/measure_performance.R)."""

import numpy as np
import pandas as pd
import pytest

import mcmcglm_tpu as mg


@pytest.fixture(scope="module")
def dat_norm():
    rng = np.random.default_rng(1)
    n = 200
    x1 = rng.normal(size=n)
    x2 = rng.binomial(1, 0.5, n).astype(float)
    y = rng.normal(1.0 + 1.5 * x1 + 2.0 * x2, 1.0)
    return pd.DataFrame({"Y": y, "X1": x1, "X2": x2})


class TestSweep:
    def test_sequential_sweep(self, dat_norm):
        fits = mg.mcmcglm_across_tuningparams(
            [0.5, 2.0],
            tuning_parameter_name="w",
            formula="Y ~ .",
            family="gaussian",
            data=dat_norm,
            n_samples=60,
            burnin=20,
            seed=0,
        )
        assert len(fits) == 2
        assert fits.tuning_parameter_name == "w"
        assert fits[0].tuning["w"] == 0.5
        assert fits[1].tuning["w"] == 2.0
        for f in fits:
            np.testing.assert_allclose(f.coef().values, [1.0, 1.5, 2.0], atol=0.6)

    def test_batched_sweep_matches_sequential(self, dat_norm):
        """parallelise=True folds the sweep into the chain axis in ONE
        compiled run; posterior means must agree with sequential runs."""
        common = dict(
            formula="Y ~ .",
            family="gaussian",
            data=dat_norm,
            n_samples=200,
            burnin=50,
            n_chains=2,
            seed=0,
        )
        seq = mg.mcmcglm_across_tuningparams([0.5, 1.5], "w", **common)
        par = mg.mcmcglm_across_tuningparams(
            [0.5, 1.5], "w", parallelise=True, **common
        )
        assert len(par) == 2
        for fs, fp in zip(seq, par):
            assert fp.beta.shape == (2, 201, 3)
            np.testing.assert_allclose(
                fs.coef().values, fp.coef().values, atol=0.15
            )

    def test_batched_sweep_unsupported_opts_fall_back(self, dat_norm):
        """Options the single-compile batched path cannot honor must not be
        silently dropped: the sweep warns and runs sequentially instead."""
        with pytest.warns(UserWarning, match="adapt_w.*falling back"):
            fits = mg.mcmcglm_across_tuningparams(
                [0.5, 2.0], "w", parallelise=True,
                formula="Y ~ .", family="gaussian", data=dat_norm,
                n_samples=40, burnin=10, adapt_w=True,
            )
        assert len(fits) == 2
        for f in fits:
            np.testing.assert_allclose(f.coef().values, [1.0, 1.5, 2.0], atol=0.7)

    def test_batched_sweep_threads_offset(self, dat_norm):
        """offset() formula terms reach the batched engine (not dropped)."""
        dat = dat_norm.copy()
        dat["off"] = 3.0  # constant known shift of eta
        par = mg.mcmcglm_across_tuningparams(
            [0.5, 1.5], "w", parallelise=True,
            formula="Y ~ X1 + X2 + offset(off)", family="gaussian", data=dat,
            n_samples=200, burnin=50, n_chains=2, seed=0,
        )
        # with eta = offset + Xb, the intercept posterior centers near
        # 1.0 - 3.0 = -2.0; if the offset were dropped it would sit near 1.0
        icpt = par[0].coef().values[0]
        assert icpt < -1.0

    def test_batched_sweep_threads_add_intercept(self, dat_norm):
        """ADVICE round-2 medium: add_intercept on the array path must reach
        the batched engine — a silent no-intercept fit would center the
        first coefficient wrongly."""
        X = np.column_stack([dat_norm["X1"], dat_norm["X2"]])
        y = np.asarray(dat_norm["Y"])
        par = mg.mcmcglm_across_tuningparams(
            [0.5, 1.5], "w", parallelise=True,
            X=X, y=y, family="gaussian", add_intercept=True,
            n_samples=200, burnin=50, n_chains=2, seed=0,
        )
        for f in par:
            assert f.beta.shape == (2, 201, 3)  # intercept column present
            assert f.columns[0] == "(Intercept)"
            np.testing.assert_allclose(
                f.coef().values, [1.0, 1.5, 2.0], atol=0.3
            )

    def test_sweep_other_param(self, dat_norm):
        fits = mg.mcmcglm_across_tuningparams(
            [2.0, 50.0],
            tuning_parameter_name="df",
            formula="Y ~ .",
            family="gaussian",
            data=dat_norm,
            slice_fn="genelliptical",
            mu=1.0,
            sigma=2.0,
            n_samples=60,
            burnin=20,
        )
        assert fits[0].tuning["df"] == 2.0
        assert fits[0].tuning["mu"] == 1.0

    def test_sweep_plot(self, dat_norm):
        fits = mg.mcmcglm_across_tuningparams(
            [0.5, 2.0], "w", formula="Y ~ .", data=dat_norm,
            family="gaussian", n_samples=30, burnin=5,
        )
        fig = mg.plot_mcmcglm_across_tuningparams(fits)
        assert len(fig.axes) >= 2


class TestComptime:
    def test_compare_across_nvars(self):
        df = mg.compare_eta_comptime_across_nvars(
            n_vars=[2, 5], n=50, n_samples=20, burnin=0
        )
        assert set(df.linear_predictor_calc) == {"update", "naive"}
        assert sorted(df.n_vars.unique()) == [2, 5]
        assert (df.time > 0).all()
        # default w applied (parity: R/measure_performance.R:125)
        assert (df.w == 0.5).all()

    def test_plot(self):
        df = mg.compare_eta_comptime_across_nvars(
            n_vars=[2, 4], n=40, n_samples=10, burnin=0
        )
        fig = mg.plot_eta_comptime(df)
        assert fig.axes


class TestComptimeParallel:
    def test_parallelise_matches_sequential_schema(self):
        """parallelise=True fans per-width comparisons out over spawned
        CPU worker processes (reference future-multisession parity,
        R/measure_performance.R:130-145); rows carry the parallelised
        flag (:149) and the same schema as the sequential path."""
        seq = mg.compare_eta_comptime_across_nvars(
            n_vars=[2, 4], n=40, n_samples=5, burnin=0
        )
        par = mg.compare_eta_comptime_across_nvars(
            n_vars=[2, 4], n=40, n_samples=5, burnin=0,
            parallelise=True, n_cores=2,
        )
        assert bool(par.parallelised.all()) and not bool(seq.parallelised.any())
        assert list(par.columns) == list(seq.columns)
        assert sorted(par.n_vars.unique()) == [2, 4]
        assert set(par.linear_predictor_calc) == {"update", "naive"}
        assert (par.time > 0).all()
