"""On-device streaming min-ESS (parallel.pooled ESSState): agreement with
the host FFT+Geyer reference estimator (diagnostics.ess), split-chain
semantics, and the run_thinned integration paths (local, chain-sharded,
obs-sharded).  SURVEY §8.3: multi-host ESS without gathering sample
matrices — the host transfer is (d,), not (C, K, d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.diagnostics import ess as ess_host
from mcmcglm_tpu.parallel.pooled import (
    ess_from_state,
    init_ess,
    update_ess,
)


def _ar1_draws(C, K, d, rho=0.5, seed=0):
    """AR(1) chains with known autocorrelation (well within a 64-lag
    window for rho <= 0.7)."""
    rng = np.random.default_rng(seed)
    x = np.zeros((C, K, d))
    x[:, 0] = rng.normal(size=(C, d))
    innov = rng.normal(size=(C, K, d)) * np.sqrt(1 - rho**2)
    for t in range(1, K):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x + rng.normal(size=(1, 1, d))  # per-param offset


def _stream(draws, max_lag=64, dtype=jnp.float64):
    C, K, d = draws.shape
    st = init_ess(C, d, planned=K, max_lag=max_lag, dtype=dtype)
    up = jax.jit(update_ess)
    for t in range(K):
        st = up(st, jnp.asarray(draws[:, t], dtype))
    return st


class TestAccumulatorVsFFT:
    @pytest.mark.parametrize("K", [200, 201])  # odd K: middle draw skipped
    def test_matches_fft_reference(self, K):
        draws = _ar1_draws(C=4, K=K, d=3, rho=0.5)
        st = _stream(draws)
        dev = np.asarray(jax.jit(ess_from_state)(st))
        ref = ess_host(draws, use_native=False)
        # same estimator, different arithmetic order (and the FFT pads);
        # truncation lag ~ a few for rho=0.5, far below the 64-lag window
        np.testing.assert_allclose(dev, ref, rtol=0.02)

    def test_float32_within_5pct(self):
        draws = _ar1_draws(C=8, K=300, d=4, rho=0.6, seed=1)
        st = _stream(draws, dtype=jnp.float32)
        dev = np.asarray(jax.jit(ess_from_state)(st))
        ref = ess_host(draws, use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.05)

    def test_iid_draws_near_full_ess(self):
        rng = np.random.default_rng(3)
        draws = rng.normal(size=(4, 240, 2))
        st = _stream(draws)
        dev = np.asarray(ess_from_state(st))
        total = draws.shape[0] * draws.shape[1]
        assert (dev > 0.5 * total).all()
        ref = ess_host(draws, use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.02)

    def test_window_truncation_is_finite_for_sticky_chains(self):
        """tau beyond the window: the windowed estimate stays finite and
        positive (it truncates the Geyer sum at L, reproducing the FFT
        reference only when truncation happens inside the window)."""
        draws = _ar1_draws(C=4, K=400, d=2, rho=0.995, seed=4)
        st = _stream(draws, max_lag=32)
        dev = np.asarray(ess_from_state(st))
        assert np.isfinite(dev).all() and (dev > 0).all()

    def test_small_planned_clamps_window(self):
        draws = _ar1_draws(C=4, K=40, d=2, rho=0.3, seed=5)
        st = _stream(draws, max_lag=64)  # clamped to 20
        assert st.s.shape[2] == 20
        dev = np.asarray(ess_from_state(st))
        ref = ess_host(draws, use_native=False)
        # noisy 20-draw halves: Geyer truncation can brush the clamped
        # window, so agreement is looser than the long-chain cases
        np.testing.assert_allclose(dev, ref, rtol=0.07)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, d = 300, 4
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta = np.array([1.0, 1.5, -0.5, 0.3])
    y = rng.normal(X @ beta, 1.0)
    return X, y


class TestRunThinnedIntegration:
    def test_local_freerun_ess_stream(self, problem):
        from mcmcglm_tpu.freerun import FreeRunCGGibbs

        X, y = problem
        d = X.shape[1]
        eng = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), d),
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        state = eng.init(jax.random.key(0), 8)
        state, _, _ = eng.warmup(state, 50)
        state, mom, kept, nev, es = eng.run_thinned(
            state, 120, 2, ess=True
        )
        dev = np.asarray(ess_from_state(es))
        ref = ess_host(np.asarray(kept), use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.05)
        assert float(es.count) == 120

    def test_sharded_freerun_ess_stream(self, problem):
        from mcmcglm_tpu.parallel import ShardedFreeRunCGGibbs, make_mesh

        X, y = problem
        d = X.shape[1]
        eng = ShardedFreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), d),
            extra={"sd": 1.0}, tuning={"w": 0.5}, mesh=make_mesh(8, 1),
        )
        state = eng.init(jax.random.key(1), 8)
        state, _, _ = eng.warmup(state, 50)
        state, mom, kept, nev, es = eng.run_thinned(
            state, 120, 2, ess=True
        )
        # the accumulator is chain-sharded; ess_from_state under jit
        # lowers its chain reductions to psums — only (d,) reaches host
        dev = np.asarray(jax.jit(ess_from_state)(es))
        ref = ess_host(np.asarray(kept), use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.05)

    def test_obs_sharded_freerun_ess_stream(self, problem):
        from mcmcglm_tpu.parallel import (
            ObsShardedFreeRunCGGibbs,
            make_mesh,
        )

        X, y = problem
        d = X.shape[1]
        eng = ObsShardedFreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), d),
            extra={"sd": 1.0}, tuning={"w": 0.5}, mesh=make_mesh(2, 4),
        )
        state = eng.init(jax.random.key(2), 8)
        state, _, _ = eng.warmup(state, 50)
        state, mom, kept, nev, es = eng.run_thinned(
            state, 120, 2, ess=True
        )
        dev = np.asarray(jax.jit(ess_from_state)(es))
        ref = ess_host(np.asarray(kept), use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.05)

    def test_ess_false_keeps_four_tuple(self, problem):
        from mcmcglm_tpu.freerun import FreeRunCGGibbs

        X, y = problem
        d = X.shape[1]
        eng = FreeRunCGGibbs(
            X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), d),
            extra={"sd": 1.0}, tuning={"w": 0.5},
        )
        state = eng.init(jax.random.key(3), 4)
        out = eng.run_thinned(state, 10, 2)
        assert len(out) == 4


class TestEssDevice:
    """ess_device: the same estimator computed on device from a resident
    (C, K, d) buffer (the pod run_passes path — no host gather)."""

    def test_matches_fft_reference(self):
        from mcmcglm_tpu.parallel.pooled import ess_device

        draws = _ar1_draws(C=6, K=240, d=3, rho=0.55, seed=7)
        dev = np.asarray(
            jax.jit(ess_device)(jnp.asarray(draws, jnp.float64))
        )
        ref = ess_host(draws, use_native=False)
        np.testing.assert_allclose(dev, ref, rtol=0.02)

    def test_matches_streaming_accumulator(self):
        from mcmcglm_tpu.parallel.pooled import ess_device

        draws = _ar1_draws(C=4, K=201, d=2, rho=0.4, seed=8)  # odd K
        dev = np.asarray(
            jax.jit(ess_device)(jnp.asarray(draws, jnp.float64))
        )
        st = _stream(draws)
        acc = np.asarray(ess_from_state(st))
        np.testing.assert_allclose(dev, acc, rtol=1e-6)

    def test_sharded_buffer_only_d_to_host(self):
        """Chain-sharded buffer in, (d,) out — reductions lower to psums
        under jit over the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mcmcglm_tpu.parallel import make_mesh
        from mcmcglm_tpu.parallel.pooled import ess_device

        mesh = make_mesh(8, 1)
        draws = _ar1_draws(C=8, K=160, d=3, rho=0.5, seed=9)
        buf = jax.device_put(
            jnp.asarray(draws, jnp.float64),
            NamedSharding(mesh, P("chain", None, None)),
        )
        dev = np.asarray(jax.jit(ess_device)(buf))
        ref = ess_host(draws, use_native=False)
        assert dev.shape == (3,)
        np.testing.assert_allclose(dev, ref, rtol=0.02)
