"""FusedCGGibbs: the CGGibbs engine driven by fused Pallas kernels.

STATUS (round 1, TPU v5e, p=1000 logistic n=10k): measured ~0.83x the XLA
engine's warm throughput (308 vs 371 chain-sweeps/s at C=256, block=8;
block=16 is slower, block>=32 crashes the Mosaic compile with a 40 MB MLIR
payload).  The per-while-iteration fixed cost inside Mosaic currently
dominates the HBM-traffic savings this kernel was built for, so the XLA
engine remains the default; this path is kept as the kernel-optimisation
vehicle (see ops/pallas_cggibbs.py for the measured design notes).

Round-2 addendum: the Pallas win landed elsewhere — the freerun engine's
K-speculative battery kernels (freerun.py::_battery_fn/_battery2_fn)
keep the while-scheduling in XLA and fuse only the hot evaluation +
commit, measuring ~2.0x the classic pass composed (results/README.md).
That splits the difference this whole-sweep kernel could not: Mosaic
runs the straight-line battery, XLA runs the control flow.

Engine variant where each coordinate update is one fused Pallas kernel call
(ops/pallas_cggibbs.py) over the whole chain batch: eta lives in VMEM for
the entire slice-sampling loop, so HBM sees exactly one read and one write
of the (chains, n) state per coordinate regardless of how many slice
evaluations occur.

Scope (falls back to :class:`~mcmcglm_tpu.engine.CGGibbs` outside it):
stepping-out slice kernel, iid priors, n <= MAX_FUSED_N after padding to a
lane multiple.  RNG comes from the TPU per-core PRNG — deterministic per
seed, but a different stream than the XLA engine's jax.random; equivalence
with the XLA engine is distributional (tested in tests/test_fused.py).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .models.families import check_family
from .models.priors import IIDPrior
from .ops.pallas_cggibbs import MAX_FUSED_N, make_fused_coord_update, make_fused_sweep
from .utils.linalg import matvec

__all__ = ["FusedCGGibbs", "FusedState"]


class FusedState(NamedTuple):
    beta: jax.Array  # (C, d)
    eta: jax.Array  # (C, n_padded)
    seed_ctr: jax.Array  # () int32 — per-coordinate PRNG stream counter
    key: jax.Array  # jax PRNG key (init draws only)


class FusedCGGibbs:
    """Batch-level CGGibbs with the fused Pallas coordinate kernel."""

    def __init__(
        self,
        X,
        y,
        family,
        prior: IIDPrior,
        extra: Optional[Mapping] = None,
        tuning: Optional[Mapping] = None,
        block_chains: int = 8,
        max_stepouts: int = 128,
        max_shrink: int = 64,
        interpret: Optional[bool] = None,
        granularity: str = "sweep",
    ):
        if not isinstance(prior, IIDPrior):
            raise ValueError("FusedCGGibbs requires an IIDPrior; use CGGibbs otherwise")
        self.family = check_family(family)
        self.prior = prior
        X = np.asarray(X, np.float32)
        self.n, self.d = X.shape
        if prior.d != self.d:
            raise ValueError(f"prior dimension {prior.d} != model width {self.d}")
        self.n_padded = -(-self.n // 128) * 128
        if self.n_padded > MAX_FUSED_N:
            raise ValueError(
                f"n={self.n} (padded {self.n_padded}) exceeds the fused kernel's "
                f"VMEM budget ({MAX_FUSED_N}); use CGGibbs/ShardedCGGibbs"
            )
        pad = self.n_padded - self.n
        # zero-padded observations: x_j = 0 there, so eta never changes and
        # ld(e) - ld0 == 0 — padding contributes nothing to the reduction.
        Xp = np.concatenate([X, np.zeros((pad, self.d), np.float32)], axis=0)
        yp = np.concatenate([np.asarray(y, np.float32).reshape(-1), np.zeros(pad, np.float32)])
        self.Xt = jnp.asarray(Xp.T)  # (d, n_padded)
        self.Xt3 = self.Xt[:, None, :]  # (d, 1, n): batch-dim-sliceable form
        self.y = jnp.asarray(yp)
        # plain python floats: the Pallas kernel closure may not capture
        # traced/jax-array constants — scalars become in-kernel literals
        self.extra = {k: float(v) for k, v in dict(extra or {}).items()}
        self.tuning = {k: float(v) for k, v in dict(tuning or {}).items()}
        if "w" not in self.tuning:
            raise ValueError("FusedCGGibbs uses stepping_out; tuning must include w")
        self.block_chains = block_chains
        self.max_stepouts = max_stepouts
        self.max_shrink = max_shrink
        if granularity not in ("sweep", "coord"):
            raise ValueError("granularity must be 'sweep' or 'coord'")
        self.granularity = granularity
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() == "cpu"
        )

        extra_c = dict(self.extra)
        fam = self.family
        self._ld_eta = lambda eta, yv: fam.log_density_eta(eta, yv, extra_c)
        self._prior_logpdf = prior.dist.log_prob
        self._update_cache: dict = {}
        self._run_cache: dict = {}

    def _updater(self, n_chains):
        fn = self._update_cache.get(n_chains)
        if fn is None:
            if self.granularity == "sweep":
                fn = make_fused_sweep(
                    self._ld_eta,
                    self._prior_logpdf,
                    n_chains,
                    self.d,
                    self.n_padded,
                    block_chains=self.block_chains,
                    max_stepouts=self.max_stepouts,
                    max_shrink=self.max_shrink,
                    interpret=self.interpret,
                )
            else:
                fn = make_fused_coord_update(
                    self._ld_eta,
                    self._prior_logpdf,
                    n_chains,
                    self.n_padded,
                    block_chains=self.block_chains,
                    max_stepouts=self.max_stepouts,
                    max_shrink=self.max_shrink,
                    interpret=self.interpret,
                )
            self._update_cache[n_chains] = fn
        return fn

    # -- state -------------------------------------------------------------

    def init(self, key, n_chains: int) -> FusedState:
        if n_chains % self.block_chains:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of block_chains="
                f"{self.block_chains}"
            )
        k_init, k_seed, k_run = jax.random.split(key, 3)
        beta = jax.vmap(self.prior.sample_beta)(
            jax.random.split(k_init, n_chains)
        ).astype(jnp.float32)
        eta = jax.vmap(lambda b: matvec(b, self.Xt))(beta)
        seed0 = jax.random.randint(k_seed, (), 0, 2**31 - 1, jnp.int32)
        return FusedState(beta, eta, seed0, k_run)

    # -- sweeps ------------------------------------------------------------

    def _sweep(self, update, state: FusedState, _):
        w = jnp.float32(self.tuning["w"])
        if self.granularity == "sweep":
            eta, beta, nev = update(
                state.eta, state.beta, self.Xt3, self.y, state.seed_ctr, w
            )
            new_state = FusedState(beta, eta, state.seed_ctr + 1, state.key)
            return new_state, (beta, jnp.sum(nev))

        def coord(carry, xs):
            beta, eta, ctr = carry
            j, x_j = xs
            eta, b_new, nev = update(eta, beta[:, j], x_j, self.y, ctr, w)
            beta = beta.at[:, j].set(b_new)
            return (beta, eta, ctr + 1), jnp.sum(nev)

        (beta, eta, ctr), nev = lax.scan(
            coord, (state.beta, state.eta, state.seed_ctr),
            (jnp.arange(self.d), self.Xt),
        )
        new_state = FusedState(beta, eta, ctr, state.key)
        return new_state, (beta, nev.sum())

    def _run(self, state: FusedState, n_steps: int, n_chains: int):
        update = self._updater(n_chains)
        state, (betas, nev) = lax.scan(
            partial(self._sweep, update), state, None, length=n_steps
        )
        return state, betas, nev

    def run(self, state: FusedState, n_steps: int):
        """Advance by n_steps sweeps; betas out is (n_steps, C, d)."""
        n_chains = state.beta.shape[0]
        key_ = (n_steps, n_chains)
        fn = self._run_cache.get(key_)
        if fn is None:
            fn = jax.jit(partial(self._run, n_steps=n_steps, n_chains=n_chains))
            self._run_cache[key_] = fn
        return fn(state)

    def sample(self, key, n_samples: int, n_chains: int, chunk_size: int = 0,
               progress=None):
        """Returns (betas (C, n_samples+1, d), n_evals (n_samples,), state)."""
        state = self.init(key, n_chains)
        init_beta = np.asarray(state.beta)[:, None, :]
        if chunk_size <= 0:
            chunk_size = n_samples
        parts = [init_beta]
        nevs = []
        done = 0
        while done < n_samples:
            step = min(chunk_size, n_samples - done)
            state, betas, nev = self.run(state, step)
            parts.append(np.asarray(betas).transpose(1, 0, 2))
            nevs.append(np.asarray(nev))
            done += step
            if progress is not None:
                progress(done, n_samples)
        return np.concatenate(parts, axis=1), np.concatenate(nevs), state
