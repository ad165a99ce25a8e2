"""Distributional tests for the slice kernels: each kernel run as a Markov
chain on known 1-D targets must reproduce the target (KS test), mirroring
the validation strategy the reference delegates to qslice's own test suite
(SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st
from jax import lax

from mcmcglm_tpu.ops import get_slice_kernel

KER_PARAMS = [
    ("stepping_out", {"w": 1.0}),
    ("doubling", {"w": 0.8}),
    ("elliptical", {"mu": 0.0, "sigma": 2.0}),
    ("genelliptical", {"mu": 0.0, "sigma": 2.0, "df": 5.0}),
    ("latent", {"rate": 0.5}),
    ("quantile", {"pseudo_loc": 0.0, "pseudo_scale": 2.0}),
]

TARGETS = [
    ("std_normal", lambda x: -0.5 * x * x, st.norm()),
    (
        "gamma23",
        lambda x: jnp.where(x > 0, (2.0 - 1.0) * jnp.log(jnp.maximum(x, 1e-30)) - 3.0 * x, -jnp.inf),
        st.gamma(2.0, scale=1 / 3.0),
    ),
]


def run_chain(kernel_name, tuning, log_target, x_init, n_steps, key, n_chains=64):
    kernel = get_slice_kernel(kernel_name)

    def one_chain(key):
        def step(carry, _):
            x, state, key = carry
            key, sub = jax.random.split(key)
            res = kernel(sub, x, log_target, state=state, **tuning)
            return (res.x, res.state, key), res.x

        state0 = kernel.init_state(tuning).astype(jnp.float64)
        (_, _, _), xs = lax.scan(
            step, (jnp.float64(x_init), state0, key), None, length=n_steps
        )
        return xs

    keys = jax.random.split(key, n_chains)
    return np.asarray(jax.jit(jax.vmap(one_chain))(keys))


@pytest.mark.parametrize("kernel_name,tuning", KER_PARAMS)
@pytest.mark.parametrize("target_name,log_target,ref", TARGETS)
def test_kernel_matches_target(kernel_name, tuning, target_name, log_target, ref):
    x_init = 1.0
    xs = run_chain(
        kernel_name, tuning, log_target, x_init, n_steps=400, key=jax.random.key(3)
    )
    # drop burnin, thin across time to decorrelate, pool over chains
    pooled = xs[:, 100::5].reshape(-1)
    d, pval = st.kstest(pooled[::7], ref.cdf)  # subsample -> ~weakly dependent
    assert pval > 1e-4, f"{kernel_name} on {target_name}: KS p={pval}, D={d}"
    assert abs(np.mean(pooled) - ref.mean()) < 5 * ref.std() / np.sqrt(200)


def test_relative_target_fx0_semantics():
    """Passing fx0 must be equivalent to letting the kernel evaluate it."""
    log_target = lambda x: -0.5 * (x - 1.0) ** 2
    kernel = get_slice_kernel("stepping_out")
    key = jax.random.key(0)
    r1 = kernel(key, jnp.float64(0.3), log_target, w=jnp.float64(1.0))
    r2 = kernel(
        key, jnp.float64(0.3), log_target, fx0=log_target(jnp.float64(0.3)),
        w=jnp.float64(1.0),
    )
    np.testing.assert_allclose(float(r1.x), float(r2.x), rtol=1e-12)
    assert int(r2.n_evals) == int(r1.n_evals) - 1


def test_vmap_chains_independent():
    """vmapped kernels must produce per-lane-independent results."""
    log_target = lambda x: -0.5 * x * x
    kernel = get_slice_kernel("stepping_out")
    keys = jax.random.split(jax.random.key(7), 8)
    xs = jnp.linspace(-1.0, 1.0, 8)
    out = jax.vmap(lambda k, x: kernel(k, x, log_target, w=1.0).x)(keys, xs)
    assert len(np.unique(np.asarray(out))) == 8


def test_bounded_worst_case():
    """A pathological flat target must terminate via the shrink bound."""
    log_target = lambda x: jnp.where(jnp.abs(x) < 1e-9, 0.0, -jnp.inf)
    kernel = get_slice_kernel("stepping_out")
    res = kernel(jax.random.key(0), jnp.float64(5.0), log_target, w=0.5)
    assert np.isfinite(float(res.x))
