"""Parity tests: native C++ diagnostics kernels vs the numpy reference."""

import numpy as np
import pytest

from mcmcglm_tpu import native
from mcmcglm_tpu.diagnostics import ess


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def ar1(rng, C, K, D, rho):
    x = np.zeros((C, K, D))
    x[:, 0] = rng.normal(size=(C, D))
    innov = rng.normal(size=(C, K, D)) * np.sqrt(1 - rho**2)
    for t in range(1, K):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


class TestNativeESS:
    def test_matches_numpy(self, lib):
        rng = np.random.default_rng(0)
        x = ar1(rng, 6, 800, 5, 0.6)
        got = native.ess_bulk(x)
        ref = ess(x, use_native=False)
        np.testing.assert_allclose(got, ref, rtol=1e-10)

    def test_iid(self, lib):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 1000, 3))
        got = native.ess_bulk(x)
        ref = ess(x, use_native=False)
        np.testing.assert_allclose(got, ref, rtol=1e-10)

    def test_2d_input(self, lib):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 500))
        got = native.ess_bulk(x)
        assert got.shape == (1,)
        np.testing.assert_allclose(got[0], ess(x, use_native=False), rtol=1e-10)

    def test_dispatch_threshold(self, lib, monkeypatch):
        import mcmcglm_tpu.diagnostics as diag

        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 600, 2))
        monkeypatch.setattr(diag, "_NATIVE_THRESHOLD", 1)
        got = diag.ess(x)  # now routed through native
        ref = diag.ess(x, use_native=False)
        np.testing.assert_allclose(got, ref, rtol=1e-10)


class TestPooledMoments:
    def test_matches_direct(self, lib):
        rng = np.random.default_rng(4)
        shards = [rng.normal(loc=i, size=(50 + 10 * i, 3)) for i in range(4)]
        counts = np.array([s.shape[0] for s in shards], np.float64)
        means = np.stack([s.mean(0) for s in shards])
        m2s = np.stack([((s - s.mean(0)) ** 2).sum(0) for s in shards])
        mean, var = native.pooled_moments(counts, means, m2s)
        allx = np.concatenate(shards, axis=0)
        np.testing.assert_allclose(mean, allx.mean(0), rtol=1e-12)
        np.testing.assert_allclose(var, allx.var(0, ddof=1), rtol=1e-12)
