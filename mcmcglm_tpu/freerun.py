"""Free-running CGGibbs: lockstep-free slice-within-Gibbs for TPU.

The throughput problem this solves
----------------------------------
The scan/while CGGibbs engine (engine.py) vmaps Neal's stepping-out +
shrinkage ``lax.while_loop`` over chains, so every loop runs until the
SLOWEST chain lane converges: with ~5 useful target evaluations per
coordinate (mean) the block executes 12-20 (the max across 256 lanes).
Measured on TPU v5e the sampler is compute-bound on the per-observation
log-density transcendentals (softplus/exp over (chains, n) per evaluation),
so those wasted lockstep evaluations are wasted wall-clock one-for-one.

The design
----------
Each chain runs the *standard sequential CGGibbs algorithm* — identical
slice kernel, identical stationary distribution — but as an explicit
automaton that advances exactly ONE target evaluation per device pass.
Chains are free-running: within one pass, chain A can be shrinking
coordinate 17 of sweep 3 while chain B is stepping out coordinate 901 of
sweep 2.  Every lane does useful work on every pass, so the executed
evaluation count per chain-sweep equals the per-chain MEAN (~4-5 per
coordinate), not the cross-chain max.  Idle waste only appears at the very
end of a run, when early-finishing lanes wait for the last chain to
complete its sweep quota — an O(1/sqrt(d * sweeps)) fraction by the CLT.

Per pass, for all C chains fused into one XLA computation:

  1. gather each lane's coordinate column:  xg = X^T[j_c]          (C, n)
  2. evaluate the relative target ONCE per lane:
         e = eta + xg * (xprop - b0)
         f = logL(e) - logL_cached + prior_delta(xprop)            (C,)
     where the committed-state log likelihood is cached either per
     observation ((C, n); exact relative differences, the float32-safe
     trick of models/potential.py) or as the reduced scalar ((C,);
     eval_cache="scalar" — drops two of the five (C, n) HBM streams per
     pass, which is the pass's bottleneck on TPU)
  3. advance each lane's automaton with O(1) scalar selects:
     stepping-out endpoint tests, shrinkage accept/reject, interval
     updates — exactly the slice_stepping_out schedule (Neal 2003).
  4. an ACCEPTING evaluation commits for free: the accepted ``e`` IS the
     new eta and its ``ld(e)`` IS the refreshed log-density cache — this
     engine has no separate commit or cache-refresh pass at all.

The loop is a single hand-batched ``lax.while_loop`` (NOT vmap-of-while:
JAX's batching rule for while wraps every carry in a per-iteration select,
which would stream the whole draws buffer through HBM on every pass);
draws/beta/width updates are drop-mode scatters so each pass writes only
the rows it actually changed.

The reference's hot loop is R/mcmcglm.R:226-274 (k over samples, j over
coordinates, one univariate slice draw per (k, j) with the O(n)
incremental eta update of R/glm_utils.R:126-132); this engine reproduces
that exact per-chain schedule while keeping the TPU VPU saturated with
useful evaluations.  Equivalence with :class:`~mcmcglm_tpu.engine.CGGibbs`
is distributional (tests/test_freerun.py): same kernel, different PRNG
stream consumption order.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .models.families import Family, check_family
from .models.priors import BetaPrior
from .utils.linalg import matvec

__all__ = ["FreeRunCGGibbs", "FreeRunState"]


class FreeRunState(NamedTuple):
    # problem state, batched over chains
    beta: jax.Array  # (C, d)
    eta: jax.Array  # (C, n)
    # log-density cache at the committed eta:
    #   eval_cache="per_obs": (C, n) per-observation log densities
    #   eval_cache="scalar":  (C,) reduced log likelihood
    ld0: jax.Array
    key: jax.Array  # single PRNG key; each pass draws (C,)-vectors from it
    logw: jax.Array  # (C, d) per-coordinate log slice widths (adaptation)
    # automaton registers, all (C,)
    j: jax.Array  # current coordinate, int32
    phase: jax.Array  # 0 = stepping out, 1 = shrinking
    stepdir: jax.Array  # 0 = testing left endpoint, 1 = right
    level: jax.Array  # relative slice level (= -Exp(1))
    L: jax.Array
    R: jax.Array
    budL: jax.Array  # remaining left step budget, int32
    budR: jax.Array
    b0: jax.Array  # current beta[:, j]
    lp0: jax.Array  # prior coord log prob at b0
    w: jax.Array  # slice width for the current coordinate
    xprop: jax.Array  # proposal to evaluate next pass
    n_shrink: jax.Array  # shrink evals this coordinate, int32
    nev: jax.Array  # (C,) total target evaluations, int32


class FreeRunCGGibbs:
    """Lockstep-free CGGibbs sampler (stepping-out slice kernel).

    Same problem signature as :class:`~mcmcglm_tpu.engine.CGGibbs`
    restricted to the hot configuration —
    ``sample_method='slice_sampling'``, ``slice_kernel='stepping_out'``,
    ``linear_predictor_calc='update'``.  Any :class:`BetaPrior` whose
    ``coord_log_prob`` accepts a traced coordinate index is supported
    (all built-ins do).
    """

    def __init__(
        self,
        X,
        y,
        family,
        prior: BetaPrior,
        extra: Optional[Mapping] = None,
        tuning: Optional[Mapping] = None,
        reduce_fn=None,
        obs_weights=None,
        max_stepouts: int = 128,
        max_shrink: int = 64,
        shrink_only: bool = True,
        adapt_c: Optional[float] = None,
        dtype=jnp.float32,
        eval_cache: str = "auto",
        offset=None,
        spec_k: int = 1,
        battery_impl: str = "auto",
        x_storage: str = "f32",
    ):
        self.family: Family = check_family(family)
        # The engine only ever COMPARES log densities across eta values
        # (slice level tests; the committed-state cache is differenced),
        # so it evaluates the RELATIVE form: eta-independent per-obs
        # constants dropped.  Exact (constants cancel), cheaper (no
        # lgamma(y+1) streams), and required for Pallas batteries on
        # poisson/negbin/gamma — Mosaic cannot lower lgamma at all.
        self._ld_eta = self.family.log_density_eta_rel
        self.prior = prior
        self.dtype = dtype
        X = jnp.asarray(X, dtype)
        # x_storage="bf16": the design matrix is ROUNDED to bfloat16 once,
        # up front, and every consumer — the init matvec, the XLA row
        # gathers, AND the pallas3 in-kernel row stream (which then ships
        # the rows as actual bf16, halving the X-row bytes of the
        # 3-stream pass) — computes in f32 on the SAME rounded values.
        # The engine is therefore an EXACT sampler for the posterior of
        # X' = bf16(X): there is no within-sampler error to compare
        # against the Exp(1) slice level at all; the only change is a
        # one-time ~2^-9-relative perturbation of the design (a data
        # change far below measurement error of X in any real dataset;
        # posterior-shift quantified in tests/test_freerun_spec.py).
        # Rounding up front (not per-path) is what avoids the round-3
        # frozen-offset bug class: a MIXED-precision design (f32 init
        # matvec, bf16 updates) would freeze the per-chain residual
        # (X - X') beta0 into eta for the chain's lifetime.
        # MEASURED (results/round4_pass_budget2.log, n=10k): SLOWER than
        # f32 on the north-star config — the per-chain row gather is
        # DMA-latency-bound there, and halving bytes shrinks each DMA
        # instead of removing any.  Kept as an option for much larger n
        # (where the row DMAs are big enough to be bandwidth-limited)
        # and for HBM-capacity-constrained problems; default stays f32.
        if x_storage not in ("f32", "bf16"):
            raise ValueError(
                f"x_storage must be 'f32' or 'bf16', got {x_storage!r}"
            )
        self.x_storage = x_storage
        if x_storage == "bf16":
            X = X.astype(jnp.bfloat16).astype(dtype)
        self.n, self.d = X.shape
        # fixed additive eta component (R's offset() term): enters only at
        # eta initialisation — the incremental updates preserve it
        if offset is not None:
            offset = jnp.asarray(offset, dtype).reshape(-1)
            if offset.shape[0] != self.n:
                raise ValueError(
                    f"offset length {offset.shape[0]} != n observations {self.n}"
                )
        self.offset = offset
        if prior.d != self.d:
            raise ValueError(
                f"prior dimension {prior.d} != number of model parameters {self.d}"
            )
        self.Xt = jnp.asarray(X.T)  # (d, n)
        self.y = jnp.asarray(y, dtype).reshape(-1)
        self.extra = {k: jnp.asarray(v, dtype) for k, v in dict(extra or {}).items()}
        tuning = dict(tuning or {})
        if "w" not in tuning:
            raise ValueError(
                "A tuning parameter for the slice kernel is missing: ['w'] "
                "required by 'stepping_out'"
            )
        self.w0 = float(tuning["w"])
        user_reduce_fn = reduce_fn is not None
        if obs_weights is not None:
            ow = jnp.asarray(obs_weights, dtype).reshape(-1)
            if ow.shape[0] != self.n:
                raise ValueError(
                    f"obs_weights length {ow.shape[0]} != n observations {self.n}"
                )
            if reduce_fn is None:
                reduce_fn = lambda t: jnp.sum(t * ow, axis=-1)  # noqa: E731
        self.reduce_fn = reduce_fn or (lambda t: jnp.sum(t, axis=-1))
        self.max_stepouts = int(max_stepouts)
        self.max_shrink = int(max_shrink)
        # sampling runs use the m=1 shrink-only kernel by default (see
        # _begin_coord); warmup always uses the full stepping-out schedule
        self.shrink_only = bool(shrink_only)
        self._adapt_rate = 0.08
        # warmup width target: w ~= adapt_c * typical accepted move.  Larger
        # c widens intervals -> better per-sweep mixing (less slice
        # truncation) at the cost of more shrink evaluations.  Measured
        # frontier on the p=1000 logistic north-star (TPU v5e, C=256,
        # shrink-only): c=3 -> 1.3 evals/coord but ESS/draw ~0.1;
        # c=40 -> 3.1 evals/coord with ESS/draw ~0.7 and the best ESS/s
        # (391 min-ESS/s vs 363 for full stepping-out at 4.9 evals/coord);
        # c>=60 is flat at spec_k=1.  With a K=4 battery wider widths are
        # cheaper (extra evaluations can ride in the same fused pass) and
        # one same-window pair measured c=80 as free (+10% ESS/s,
        # results/round3_battery_probes.log session 7), but two later
        # same-process bracketed probes (sessions 8-9) measured c=80 at
        # 0.84x the sweeps/s with the ESS/draw gain only partially
        # compensating — the frontier is window-dependent on this
        # hardware, so the default stays at the robust c=40; pass
        # adapt_c=80 explicitly to trade pass cost for per-draw mixing.
        self._adapt_c_arg = adapt_c  # resolved after battery_impl below
        # eval_cache: how the committed-state log likelihood is cached for
        # the relative slice comparison f = logL(prop) - logL(current).
        #   "per_obs": cache per-observation log densities (C, n); reduce
        #       the per-observation DIFFERENCES — exact cancellation, but
        #       two extra (C, n) HBM streams per pass (read + refresh).
        #   "scalar": cache the reduced scalar (C,); compare full-magnitude
        #       sums — 5 -> 3 (C, n) streams per pass (the pass is HBM-
        #       bandwidth-bound on TPU; measured 1.4-1.6x pass rate at the
        #       p=1000 logistic north star), at roundoff ~ eps *
        #       sqrt(log2 n) * sum|ld| on the slice log scale.
        #   "auto": "scalar" when that roundoff estimate (from the log
        #       density at eta = 0) is far below the Exp(1) slice level,
        #       else "per_obs".
        if eval_cache not in ("auto", "scalar", "per_obs"):
            raise ValueError(
                f"eval_cache must be 'auto', 'scalar' or 'per_obs', got {eval_cache!r}"
            )
        if eval_cache == "auto":
            ld_at0 = np.asarray(
                self._ld_eta(
                    jnp.zeros((self.n,), dtype), self.y, self.extra
                )
            )
            eps = float(np.finfo(np.dtype(dtype)).eps)
            err = (
                eps
                * float(np.sqrt(np.log2(max(self.n, 4))))
                * float(np.sum(np.abs(ld_at0)))
            )
            eval_cache = "scalar" if err < 0.01 else "per_obs"
        self.eval_cache = eval_cache
        # spec_k: speculative proposals evaluated per pass (see _pass_spec).
        # 1 = classic one-evaluation automaton; K>1 batches K target
        # evaluations into one fused pass.
        self.spec_k = int(spec_k)
        if not 1 <= self.spec_k <= 32:
            raise ValueError(f"spec_k must be in [1, 32], got {spec_k}")
        # batched prior hooks (prior API is per-chain)
        self._coord_lp = jax.vmap(self.prior.coord_log_prob, in_axes=(0, 0, 0))
        # same, over a (C, K) proposal battery
        self._coord_lp_k = jax.vmap(self._coord_lp, in_axes=(None, None, 1),
                                    out_axes=1)
        self._run_cache: dict = {}

        # -- battery implementation for the K-speculative eval ----------------
        # "xla": the (C, K, n) broadcast+reduce.  XLA re-streams eta and the
        #     gathered X^T rows once PER PROPOSAL, so pass cost grows ~linearly
        #     in K and speculation only wins ~1.17x (scripts/battery_probe.py).
        # "pallas": a Pallas grid kernel that reads eta/xg from HBM ONCE and
        #     evaluates all K proposals in-register against a (C, K) VMEM
        #     accumulator — the pass is HBM-bound, so K rides nearly free.
        #     Requires the scalar eval cache, a plain/weighted-sum reduction
        #     and scalar extra args; the observation axis is zero-padded to a
        #     lane-aligned length, with the (padded) weight vector doubling as
        #     the reduction mask.  Measured 1.41x the K=1 pass end-to-end —
        #     short of the stream-count promise because the pass still
        #     materialises the X^T gather and re-reads eta/xg for the commit
        #     (~6 (C, n) streams total).
        # "pallas2": "pallas" plus the eta COMMIT fused into the kernel —
        #     the acceptance decision is replayed in-kernel and the
        #     committed eta written out, removing the XLA commit's second
        #     read of eta/xg and its separate eta write (~6 -> ~4 (C, n)
        #     streams per pass).  The automaton outside recomputes the
        #     identical decision from the returned sums (bitwise the same
        #     inputs), keeping all bookkeeping in XLA.  (A 3-stream variant
        #     that also gathers X^T rows in-kernel by DMA is blocked by
        #     Mosaic's tiling rule — single-row slices of an (8, 128)-tiled
        #     HBM array are rejected — see _battery2_fn.)
        # "pallas3": the 3-stream pass — the X^T row gather moves INSIDE the
        #     kernel.  Mosaic rejects single-row DMA from a (d, n) array
        #     because dim 0 sits in the (8, 128) tiling pair, but reshaping
        #     to (d, S, 128) moves the gathered dim out of the tiled pair:
        #     a (1, S, 128) block selected by a scalar-prefetch index_map
        #     (j per chain) is fully tile-aligned.  This removes BOTH the
        #     XLA gather's read+write of xg and the kernel's re-read
        #     (~5 -> ~3 (C, n) streams per pass: read eta, read X rows,
        #     write eta).  State eta is carried in the (C, S, 128) layout so
        #     no per-pass relayout is paid.
        # "auto": "pallas3" when spec_k > 1, the constraints hold, the
        #     observation count fits its per-step VMEM budget and the
        #     backend is an accelerator (measured 1.2-1.4x "pallas2" in
        #     same-process interleaved A/B at K=4 on the north star —
        #     results/round3_battery_probes.log); "pallas2" for larger n
        #     (falling back to "pallas", then "xla", when the chain count
        #     defeats its block layout); "xla" on CPU.
        if battery_impl not in ("auto", "xla", "pallas", "pallas2", "pallas3"):
            raise ValueError(
                "battery_impl must be 'auto', 'xla', 'pallas', 'pallas2' or "
                f"'pallas3', got {battery_impl!r}"
            )
        extras_scalar = all(
            jnp.ndim(v) == 0 for v in self.extra.values()
        )
        pallas_ok = (
            self.spec_k > 1
            and self.eval_cache == "scalar"
            and extras_scalar
            and not user_reduce_fn  # default sum / obs_weights sum only
            and dtype == jnp.float32
        )
        if battery_impl in ("pallas", "pallas2", "pallas3") and not pallas_ok:
            raise ValueError(
                f"battery_impl={battery_impl!r} requires spec_k > 1, "
                "eval_cache='scalar', scalar extra args, no custom reduce_fn "
                "and float32"
            )
        battery_auto = battery_impl == "auto"
        if battery_auto:
            if pallas_ok and jax.default_backend() != "cpu":
                bn_a = 2048 if self.n >= 2048 else 256
                n_pad_a = -(-self.n // bn_a) * bn_a
                fits3 = 2 * (24 * n_pad_a) * 4 <= 12 * 1024 * 1024
                battery_impl = "pallas3" if fits3 else "pallas2"
            else:
                battery_impl = "xla"
        self.battery_impl = battery_impl
        self._battery_cache: dict = {}
        self._eta3 = None  # (S, L) when state eta is carried 3-D (pallas3)
        if battery_impl in ("pallas", "pallas2", "pallas3"):
            # pad the observation axis once so every pass runs lane-aligned;
            # the padded weight/mask slots are zero, so padded observations
            # never contribute to any reduction.  Padded y is 1.0, NOT 0:
            # several families' log densities contain log(y) terms (gamma,
            # inverse-gaussian, poisson's lgamma(y+1) is fine but negbin's
            # lgamma(y+r) wants y finite) that are -inf/NaN at y=0, and the
            # reductions mask by SELECTION (where), not multiplication,
            # because 0 * NaN = NaN — either alone would leave a family
            # (e.g. inverse-gaussian's linkinv(0) = inf) able to freeze
            # every chain at its init via an all-NaN slice comparison.
            bn = 2048 if self.n >= 2048 else 256
            self._battery_bn = bn
            n_pad = -(-self.n // bn) * bn
            pad = n_pad - self.n
            w_vec = ow if obs_weights is not None else jnp.ones((self.n,), dtype)
            self._mask = jnp.pad(w_vec, (0, pad))
            self.Xt = jnp.pad(self.Xt, ((0, 0), (0, pad)))
            self.y = jnp.pad(self.y, (0, pad), constant_values=1.0)
            if self.offset is not None:
                self.offset = jnp.pad(self.offset, (0, pad))
            mask = self._mask
            self.reduce_fn = lambda t: jnp.sum(
                jnp.where(mask != 0, t * mask, 0.0), axis=-1
            )
            # (1, n_pad) operand views built OUTSIDE any trace: _battery_fn
            # may first run while tracing a jitted pass, and reshaping there
            # would capture (and leak) trace-local tracers in its cache
            self._y2 = self.y.reshape(1, n_pad)
            self._m2 = self._mask.reshape(1, n_pad)
            if battery_impl == "pallas3":
                # 3-D operand layout: observation axis n_pad -> (S, 128) so
                # the per-chain X^T row gather becomes a tile-aligned
                # (1, S, 128) block DMA (see _battery3_fn).  n_pad is a
                # multiple of 256, so S = n_pad // 128 is integral.
                L = 128
                S = n_pad // L
                # per-grid-step VMEM, double-buffered: eta (8, S, L) +
                # 8 gathered rows + eta_new (8, S, L) = 24 (S, L) f32 tiles
                if 2 * (24 * S * L) * 4 > 12 * 1024 * 1024:
                    raise ValueError(
                        f"battery_impl='pallas3' with n_pad={n_pad} exceeds "
                        "the per-step VMEM budget; use 'pallas' (n-tiled)"
                    )
                self._eta3 = (S, L)
                # bf16 storage halves the X-row stream of the 3-stream
                # pass; values are ALREADY bf16-rounded (see x_storage
                # above), so the cast is lossless here and the kernel's
                # f32 upcast reproduces identical arithmetic
                self._Xt3 = self.Xt.reshape(self.d, S, L).astype(
                    jnp.bfloat16 if x_storage == "bf16" else dtype
                )
                self._y3 = self.y.reshape(1, S, L)
                self._m3 = self._mask.reshape(1, S, L)
        self._battery_auto = battery_auto
        # auto selection is finalised per chain count at first init():
        # every Pallas battery's block layout needs C % 8 == 0 (pallas3's
        # BC=1 fallback measured SLOWER than the classic pass), so auto
        # demotes to "xla" for odd chain counts — see _resolve_battery.
        self._battery_resolved = False
        if (
            battery_auto
            and self.battery_impl in ("pallas", "pallas2", "pallas3")
            and not self._battery_lowerable()
        ):
            # a family whose log density uses a primitive Mosaic cannot
            # lower (erf for probit links, arbitrary user-registered
            # densities, ...) would crash at first trace: the auto
            # selection probes lowerability up front (a compile-free
            # eval_shape of the kernel) and quietly drops to the XLA
            # battery.  Explicitly requested Pallas impls still fail
            # loudly at first use — the user asked for that kernel.
            self.battery_impl = "xla"
            self._eta3 = None  # 2-D eta layout for the XLA pass
        self.adapt_c = float(
            self._adapt_c_arg if self._adapt_c_arg is not None else 40.0
        )

    def _battery_lowerable(self) -> bool:
        """Compile-free probe of whether the selected Pallas battery's
        kernel can lower on this backend.

        Mosaic rejects some primitives outright during lowering
        (observed: lgamma, erf, expm1 — "Unimplemented primitive in
        Pallas TPU lowering"), so ``jax.jit(fn).lower(...)`` of a tiny
        battery call surfaces the failure client-side without invoking
        the backend compiler.  Used by the "auto" battery selection; CPU
        (interpret mode) accepts everything."""
        if jax.default_backend() == "cpu":
            return True
        C, K = 8, self.spec_k
        f32 = jnp.float32
        n_pad = int(np.prod(self.Xt.shape[1:]))
        try:
            if self.battery_impl == "pallas3":
                fn = self._battery3_fn(C)
                S, L = self._eta3
                args = (
                    jax.ShapeDtypeStruct((C,), jnp.int32),
                    jax.ShapeDtypeStruct((C, S, L), f32),
                    jax.ShapeDtypeStruct((C, K), f32),
                    jax.ShapeDtypeStruct((C, K), f32),
                    jax.ShapeDtypeStruct((C, 4), f32),
                )
            elif self.battery_impl == "pallas2":
                fn = self._battery2_fn(C)
                args = (
                    jax.ShapeDtypeStruct((C, n_pad), f32),
                    jax.ShapeDtypeStruct((C, n_pad), f32),
                    jax.ShapeDtypeStruct((C, K), f32),
                    jax.ShapeDtypeStruct((C, K), f32),
                    jax.ShapeDtypeStruct((C, 4), f32),
                )
            else:
                fn = self._battery_fn(C)
                args = (
                    jax.ShapeDtypeStruct((C, n_pad), f32),
                    jax.ShapeDtypeStruct((C, n_pad), f32),
                    jax.ShapeDtypeStruct((C, K), f32),
                )
            if fn is None:
                return True  # per-C fallback chain decides at run time
            jax.jit(fn).lower(*args)
            return True
        except (NotImplementedError, ValueError, TypeError) as exc:
            # NotImplementedError is Mosaic's usual "Unimplemented
            # primitive" signal; lowering failures also surface as wrapped
            # LoweringError (a ValueError subclass) / TypeError depending
            # on the JAX version — auto mode degrades to the XLA battery
            # for these, WARNING which exception triggered the demotion so
            # a genuine bug introduced in a battery doesn't silently ship
            # as a perf regression.  Explicitly requested Pallas impls
            # still fail loudly at first use; unknown exception types
            # propagate.
            import warnings

            warnings.warn(
                f"auto battery selection: {self.battery_impl!r} failed to "
                f"lower ({type(exc).__name__}: {exc}); falling back to the "
                "XLA battery",
                RuntimeWarning,
                stacklevel=3,
            )
            return False
        finally:
            self._battery_cache.clear()  # drop the C=8 probe builds

    def _resolve_battery(self, C: int) -> None:
        """Finalise the auto battery selection for the first chain count
        seen.  Every Pallas battery's block layout requires C % 8 == 0
        (BC candidates are multiples of 8; pallas3's BC=1 fallback was
        measured slower than the classic pass — results/README.md), so an
        auto selection demotes to the XLA battery for odd chain counts.
        Latched at first init: states carry the eta layout chosen here,
        so re-resolving for a different C would orphan existing states.
        Explicitly requested Pallas impls are never demoted."""
        if self._battery_resolved:
            return
        self._battery_resolved = True
        if (
            self._battery_auto
            and C % 8 != 0
            and self.battery_impl in ("pallas", "pallas2", "pallas3")
        ):
            self.battery_impl = "xla"
            self._eta3 = None  # 2-D eta layout (operands stay padded)

    # -- Pallas K-proposal battery evaluator --------------------------------

    def _battery_fn(self, C: int):
        """Build (and cache) the one-read battery kernel for C chains.

        Computes lsum[c, k] = sum_i mask_i * ld(eta[c,i] + xg[c,i] *
        deltas[c,k]) over the padded observation axis with ONE HBM read of
        eta and xg: grid (C/BC, n_pad/BN), the K proposals unrolled
        in-register per (BC, BN) tile, (C, K) accumulator resident in VMEM
        across the n-grid.  The XLA formulation of the same battery streams
        eta/xg once per proposal (scripts/battery_probe.py) — on an
        HBM-bound pass that forfeits the entire speculation win.
        """
        fn = self._battery_cache.get(C)
        if fn is not None:
            return fn
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        K = self.spec_k
        n_pad = int(self.Xt.shape[1])
        BN = self._battery_bn
        BC = next((b for b in (128, 64, 32, 16, 8) if C % b == 0), None)
        if BC is None:
            return None  # odd chain counts: caller falls back to XLA
        ld_fn = self._ld_eta
        extra = {k: float(v) for k, v in self.extra.items()}
        y2 = self._y2
        m2 = self._m2

        def kernel(eta_ref, xg_ref, deltas_ref, y_ref, m_ref, out_ref):
            nb = pl.program_id(1)

            @pl.when(nb == 0)
            def _init():
                out_ref[...] = jnp.zeros_like(out_ref)

            eta = eta_ref[...]  # (BC, BN)
            xg = xg_ref[...]
            deltas = deltas_ref[...]  # (BC, K)
            yv = y_ref[...]  # (1, BN)
            mv = m_ref[...]
            cols = []
            for k in range(K):
                e = eta + xg * deltas[:, k][:, None]
                ld = ld_fn(e, yv, extra)
                # selection, not multiplication: padded slots may hold NaN
                cols.append(jnp.sum(jnp.where(mv != 0, ld * mv, 0.0),
                                    axis=1, keepdims=True))
            out_ref[...] += jnp.concatenate(cols, axis=1)

        call = pl.pallas_call(
            kernel,
            grid=(C // BC, n_pad // BN),
            in_specs=[
                pl.BlockSpec((BC, BN), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, BN), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BC, K), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, K), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )

        def fn(eta, xg, deltas):
            return call(eta, xg, deltas, y2, m2)

        self._battery_cache[C] = fn
        return fn

    def _battery2_fn(self, C: int):
        """Build (and cache) the fused battery + eta-commit kernel.

        One kernel evaluates the K-proposal battery against the
        VMEM-resident eta/xg blocks, REPLAYS the first-acceptor decision
        in-kernel, and writes the committed eta.  Relative to the
        "pallas" variant this removes the XLA commit's second read of
        eta/xg and its separate eta write (~6 -> ~4 (C, n) streams per
        pass; the remaining overhead vs the non-speculative pass is the
        materialised X^T gather, which Mosaic cannot avoid: single-row
        DMA from an (8, 128)-tiled HBM array is rejected — "slice shape
        along dimension 0 must be aligned to tiling (8)" — so the gather
        stays in XLA where it is a native row gather).  Outputs
        (lsum (C, K), eta_new (C, n_pad)); the caller's automaton
        recomputes the same decision from lsum on bitwise-identical
        inputs, so all bookkeeping stays in XLA.

        Per-chain decision operands are packed into scal (C, 4):
        [slice level, cached scalar log-lik ld0, commit gate (1.0 when the
        lane is shrinking AND active), remaining shrink budget].
        """
        key_ = ("v2", C)
        fn = self._battery_cache.get(key_)
        if fn is not None:
            return fn
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        K = self.spec_k
        n_pad = int(self.Xt.shape[1])
        # VMEM budget: unlike _battery_fn this kernel holds whole (BC, n_pad)
        # rows resident (no observation-axis grid), and Mosaic double-buffers
        # the chain-grid inputs — ~2x(eta + xg) in + 2x eta_new out + y/m,
        # i.e. ~(6*BC + 4) * n_pad * 4 bytes.  Past ~12 MB of the ~16 MB/core
        # the compile fails with VMEM exhaustion, so pick the largest fitting
        # BC and return None (-> n-tiled "pallas" battery) when even BC=8
        # does not fit.
        budget = 12 * 1024 * 1024
        BC = next(
            (b for b in (32, 16, 8)
             if C % b == 0 and (6 * b + 4) * n_pad * 4 <= budget),
            None,
        )
        if BC is None:
            return None  # odd chain counts / VMEM overflow: caller falls back
        ld_fn = self._ld_eta
        extra = {k: float(v) for k, v in self.extra.items()}
        y2 = self._y2
        m2 = self._m2

        def kernel(eta_ref, xg_ref, deltas_ref, fprior_ref, scal_ref,
                   y_ref, m_ref, lsum_ref, eta_new_ref):
            eta = eta_ref[...]  # (BC, n_pad), VMEM
            xgv = xg_ref[...]
            deltas = deltas_ref[...]  # (BC, K)
            yv = y_ref[...]  # (1, n_pad)
            mv = m_ref[...]

            # the K-battery: masked log-lik sums, one read of eta/xg
            # (selection, not multiplication: padded slots may hold NaN)
            cols = []
            for k in range(K):
                e = eta + xgv * deltas[:, k][:, None]
                ld = ld_fn(e, yv, extra)
                cols.append(jnp.sum(jnp.where(mv != 0, ld * mv, 0.0),
                                    axis=1, keepdims=True))
            lsum = jnp.concatenate(cols, axis=1)  # (BC, K)
            lsum_ref[...] = lsum

            # replay the first-acceptor decision (same float ops as the
            # caller: f = (lsum - ld0) + fprior, accept iff f >= level with
            # k inside the remaining shrink budget, gated on shrink+active)
            level = scal_ref[:, 0][:, None]
            ld0 = scal_ref[:, 1][:, None]
            gate = scal_ref[:, 2]
            rem = scal_ref[:, 3][:, None]
            f = (lsum - ld0) + fprior_ref[...]
            # tpu.iota is integer-only; cast for the f32 min-reduce below
            # (Mosaic lowers argmax/argmin only for f32 operands, not bool)
            kio = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 1).astype(
                jnp.float32
            )
            accv = (f >= level) & (kio < rem)
            firstf = jnp.min(jnp.where(accv, kio, jnp.float32(K)), axis=1)
            any_acc = firstf < jnp.float32(K)
            hit = kio == firstf[:, None]
            d_first = jnp.sum(jnp.where(hit, deltas, 0.0), axis=1)
            delta_star = jnp.where((gate > 0.0) & any_acc, d_first, 0.0)

            # commit
            eta_new_ref[...] = eta + xgv * delta_star[:, None]

        call = pl.pallas_call(
            kernel,
            grid=(C // BC,),
            in_specs=[
                pl.BlockSpec((BC, n_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, n_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BC, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, n_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((C, K), jnp.float32),
                jax.ShapeDtypeStruct((C, n_pad), jnp.float32),
            ),
            interpret=jax.default_backend() == "cpu",
        )

        def fn(eta, xg, deltas, fprior, scal):
            return call(eta, xg, deltas, fprior, scal, y2, m2)

        self._battery_cache[key_] = fn
        return fn

    def _battery3_fn(self, C: int):
        """Build (and cache) the 3-stream battery: in-kernel X^T row gather
        via scalar-prefetch index_map + fused eta commit.

        The round-2 design was blocked by Mosaic's tiling rule — a
        single-row slice of an (8, 128)-tiled (d, n) HBM array is rejected
        ("slice shape along dimension 0 must be aligned to tiling (8)").
        The rule binds only the LAST TWO dims, so X^T is laid out
        (d, S, 128) with S = n_pad/128: a (1, S, 128) block chosen by the
        per-chain coordinate index (scalar-prefetched j) is fully
        tile-aligned and the gather costs exactly one read of the row —
        no XLA gather write, no kernel re-read.  eta is carried in the
        matching (C, S, 128) layout (relayout once at init, never per
        pass).  Streams per pass: read eta + read X rows + write eta
        (~3 (C, n)), vs ~5 for "pallas2" and ~6 for "pallas".

        Grid is (C/BC,) with BC=8 chains per step (each chain contributes
        its own (1, S, 128) gather in_spec, so one step amortises the
        per-step DMA/bookkeeping latency over 8 chains — the BC=1 version
        measured SLOWER than pallas2 despite 40% less traffic, ~0.8 us of
        step overhead x C steps).  The (S, 128) per-chain tile keeps all 8
        sublanes busy.  The first-acceptor decision is replayed in-kernel
        exactly as in _battery2_fn; outputs (lsum (C, K),
        eta_new (C, S, 128))."""
        key_ = ("v3", C)
        fn = self._battery_cache.get(key_)
        if fn is not None:
            return fn
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        K = self.spec_k
        S, L = self._eta3
        # chains per grid step: 8 default (BC=1 measured slower than the
        # classic pass; the pass-budget probe showed the in-kernel row
        # gather is DMA-LATENCY-bound, not bandwidth-bound, so batching
        # more row DMAs per step can overlap them further — override via
        # _bc3 for probing)
        BC = getattr(self, "_bc3", None) or (8 if C % 8 == 0 else 1)
        if C % BC != 0:
            raise ValueError(f"_bc3={BC} does not divide C={C}")
        ld_fn = self._ld_eta
        extra = {k: float(v) for k, v in self.extra.items()}
        y3 = self._y3
        m3 = self._m3
        Xt3 = self._Xt3

        def kernel(j_ref, eta_ref, *rest):
            xrows = rest[:BC]  # BC gathered X^T rows, DMA'd by index_map
            (deltas_ref, fprior_ref, scal_ref, y_ref, m_ref,
             lsum_ref, eta_new_ref) = rest[BC:]
            yv = y_ref[0]
            mv = m_ref[0]
            for r in range(BC):
                eta = eta_ref[r]  # (S, L)
                xg = xrows[r][0].astype(jnp.float32)  # no-op when f32
                deltas = deltas_ref[r]  # (1, K)

                cols = []
                for k in range(K):
                    e = eta + xg * deltas[0:1, k:k + 1]
                    ld = ld_fn(e, yv, extra)
                    t = jnp.where(mv != 0, ld * mv, 0.0)
                    s2 = jnp.sum(t, axis=0, keepdims=True)  # (1, L)
                    cols.append(jnp.sum(s2, axis=1, keepdims=True))
                lsum = jnp.concatenate(cols, axis=1)  # (1, K)
                lsum_ref[r] = lsum

                scal = scal_ref[r]  # (1, 4)
                level = scal[:, 0:1]
                ld0 = scal[:, 1:2]
                gate = scal[:, 2:3]
                rem = scal[:, 3:4]
                f = (lsum - ld0) + fprior_ref[r]
                kio = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1).astype(
                    jnp.float32
                )
                accv = (f >= level) & (kio < rem)
                firstf = jnp.min(jnp.where(accv, kio, jnp.float32(K)),
                                 axis=1, keepdims=True)  # (1, 1)
                any_acc = firstf < jnp.float32(K)
                hit = kio == firstf
                d_first = jnp.sum(jnp.where(hit, deltas, 0.0), axis=1,
                                  keepdims=True)
                delta_star = jnp.where((gate > 0.0) & any_acc, d_first, 0.0)
                eta_new_ref[r] = eta + xg * delta_star

        # Mosaic's block rule binds the LAST TWO dims of every block (each
        # must be 8/128-divisible or equal the full dim): the 3-D layouts
        # make every block legal — (1, S, L) gathers of (d, S, L) slice
        # only the untiled dim 0, and the small per-chain operands ship as
        # (C, 1, K) with (BC, 1, K) blocks.
        def _xrow_spec(r):
            return pl.BlockSpec(
                (1, S, L), lambda i, j_ref, r=r: (j_ref[BC * i + r], 0, 0),
                memory_space=pltpu.VMEM,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # j: (C,) int32 coordinate indices
            grid=(C // BC,),
            in_specs=[
                pl.BlockSpec((BC, S, L), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [_xrow_spec(r) for r in range(BC)] + [
                pl.BlockSpec((BC, 1, K), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1, K), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1, 4), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, L), lambda i, j_ref: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, L), lambda i, j_ref: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BC, 1, K), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, S, L), lambda i, j_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((C, 1, K), jnp.float32),
                jax.ShapeDtypeStruct((C, S, L), jnp.float32),
            ),
            interpret=jax.default_backend() == "cpu",
        )

        def fn(j, eta, deltas, fprior, scal):
            lsum, eta_new = call(
                j, eta, *([Xt3] * BC), deltas[:, None, :],
                fprior[:, None, :], scal[:, None, :], y3, m3,
            )
            return lsum[:, 0, :], eta_new

        self._battery_cache[key_] = fn
        return fn

    # -- coordinate initialisation (batched) ---------------------------------

    def _begin_coord(self, key, beta, logw, j, shrink_only, ubatch=None):
        """Level + initial interval for each lane's coordinate j.  Returns a
        dict of fresh automaton registers.

        ``ubatch`` (C, 3) optionally supplies the three uniforms (level,
        interval position, stepout split) drawn as ONE batched call by the
        pass — each separate (C,)-draw pays a fixed threefry dispatch cost
        (~22 us/pass total for the pass's six RNG ops,
        results/round4_pass_budget2.log).  Same law either way.

        ``shrink_only=True`` is Neal's procedure with a step-out budget of
        m = 1: the randomly-positioned width-w interval is used directly
        (J = K = 0, so Fig. 3's while conditions short-circuit and the
        endpoints are never evaluated) and the lane starts in the shrinkage
        phase with a uniform draw on (L, R).  This is an exact slice kernel
        for any w; with warmup-adapted widths (~3-4x the conditional scale)
        it needs ~2-3 evaluations per coordinate — the TPU sampling
        configuration.  ``shrink_only=False`` is the full stepping-out
        schedule (used for warmup, where widths may start badly sized).

        ``shrink_only`` may also be a (C,) bool array — the two-phase
        warmup mode, where each lane switches from the full stepping-out
        schedule to the shrink-only kernel once its own warmup sweep count
        crosses the stepout quota (see :meth:`warmup`).  PRNG consumption
        is identical across all three modes."""
        dtype = self.dtype
        C = beta.shape[0]
        if ubatch is None:
            k_level, k_u, k_j = jax.random.split(key, 3)
            level = -jax.random.exponential(k_level, (C,), dtype=dtype)
            u = jax.random.uniform(k_u, (C,), dtype=dtype)
            uj = jax.random.uniform(k_j, (C,), dtype=dtype)
        else:
            # -Exp(1) from a uniform: log1p(-u) is exact for u in [0, 1)
            level = jnp.log1p(-ubatch[:, 0])
            u = ubatch[:, 1]
            uj = ubatch[:, 2]
        w = jnp.exp(jnp.take_along_axis(logw, j[:, None], axis=1)[:, 0])
        b0 = jnp.take_along_axis(beta, j[:, None], axis=1)[:, 0]
        L = b0 - w * u
        R = L + w
        lp0 = jnp.asarray(self._coord_lp(beta, j, b0), dtype)
        zero = jnp.zeros((C,), jnp.int32)
        if isinstance(shrink_only, bool) and shrink_only:
            J = zero
            K = zero
            phase = jnp.ones((C,), jnp.int32)
            xprop = L + (R - L) * uj  # first shrink proposal
        elif isinstance(shrink_only, bool):
            J = jnp.floor(uj * self.max_stepouts).astype(jnp.int32)
            K = (self.max_stepouts - 1) - J
            phase = zero
            xprop = L
        else:  # per-lane (C,) bool: select between the two register sets
            so = shrink_only
            J_full = jnp.floor(uj * self.max_stepouts).astype(jnp.int32)
            J = jnp.where(so, 0, J_full)
            K = jnp.where(so, 0, (self.max_stepouts - 1) - J_full)
            phase = so.astype(jnp.int32)
            xprop = jnp.where(so, L + (R - L) * uj, L)
        return dict(
            level=level, L=L, R=R, budL=J, budR=K, b0=b0, lp0=lp0, w=w,
            xprop=xprop, phase=phase, stepdir=zero, n_shrink=zero,
        )

    def init(self, key, n_chains: int, beta0=None) -> FreeRunState:
        """Initial state for ``n_chains`` chains.  ``beta0`` (optional,
        (d,) or (C, d)) overrides the default prior draw — e.g. the prior
        mean or a penalised-MLE point for very wide models, where a raw
        prior draw starts O(sqrt(d)) from the posterior bulk (the
        R reference always inits from the prior, R/mcmcglm.R:200-213)."""
        self._resolve_battery(int(n_chains))
        if beta0 is not None:
            beta0 = jnp.asarray(beta0, self.dtype)
            if beta0.ndim == 1:
                beta0 = jnp.broadcast_to(beta0[None, :], (n_chains, self.d))
        return jax.jit(partial(self._init, n_chains=n_chains))(key, beta0)

    def _init(self, key, beta0=None, *, n_chains: int):
        dtype = self.dtype
        C = n_chains
        k_init, k_coord, k_run = jax.random.split(key, 3)
        beta = jax.vmap(self.prior.sample_beta)(
            jax.random.split(k_init, C)
        ).astype(dtype)
        if beta0 is not None:
            beta = jnp.asarray(beta0, dtype)
        eta = jax.vmap(lambda b: matvec(b, self.Xt))(beta)
        if self.offset is not None:
            eta = eta + self.offset[None, :]
        ld0 = self._ld_eta(eta, self.y, self.extra)
        if self.eval_cache == "scalar":
            ld0 = self.reduce_fn(ld0)
        if self._eta3 is not None:
            # pallas3 carries eta in the (C, S, 128) kernel layout: one
            # relayout here, none per pass
            eta = eta.reshape(C, *self._eta3)
        logw = jnp.full((C, self.d), jnp.log(jnp.asarray(self.w0, dtype)))
        reg = self._begin_coord(
            k_coord, beta, logw, jnp.zeros((C,), jnp.int32), shrink_only=False
        )
        return FreeRunState(
            beta=beta, eta=eta, ld0=ld0, key=k_run, logw=logw,
            j=jnp.zeros((C,), jnp.int32), nev=jnp.zeros((C,), jnp.int32),
            **reg,
        )

    def _commit_row(self, arr, j, val, gate=None):
        """arr[c, j_c] = val_c (for lanes where ``gate``), as a one-hot
        dense select instead of a scatter: XLA's TPU scatter lowering
        serialises row updates (measured 20 us/pass for the (256, 1000)
        beta commit — 13% of the whole K=4 pass,
        results/round4_pass_budget2.log); the dense where() is a plain
        ~2x(C, d) stream the VPU chews through in a few us."""
        hit = (
            lax.broadcasted_iota(jnp.int32, (1, arr.shape[1]), 1)
            == j[:, None]
        )
        if gate is not None:
            hit = hit & gate[:, None]
        return jnp.where(hit, val[:, None], arr)

    @staticmethod
    def _sweep_buffers(draws, nevbuf, rows, slot, beta, nev_new, sweep_done):
        """Record completed sweeps into the draws/nevbuf buffers.

        The drop-mode scatters only change anything on passes where some
        lane finished a sweep — for most passes every slot is OOB and the
        scatter is a pure no-op that still streams its (C, d) update
        tensor (measured ~13 us of the 153 us K=4 pass,
        results/round4_pass_budget.log).  Gating them under lax.cond
        skips that traffic on no-completion passes; on completion passes
        the scatter is bitwise the previous behavior.  nevbuf records
        each chain's cumulative evals at sweep completion -> honest
        per-sweep counts (diff on the host)."""

        def write(d_nb):
            d_, nb_ = d_nb
            return (d_.at[rows, slot].set(beta, mode="drop"),
                    nb_.at[rows, slot].set(nev_new, mode="drop"))

        return lax.cond(jnp.any(sweep_done), write, lambda d_nb: d_nb,
                        (draws, nevbuf))

    # -- the pass -------------------------------------------------------------

    def _pass(self, s: FreeRunState, sweep_count, draws, nevbuf,
              n_sweeps: int, adapt: bool, shrink_only: bool,
              stepout_sweeps=None):
        """One target evaluation + automaton advance for every chain."""
        dtype = self.dtype
        C = s.beta.shape[0]
        rows = jnp.arange(C)
        active = sweep_count < n_sweeps

        # pass-level randomness: ONE batched uniform block (each separate
        # (C,)-draw pays a fixed threefry dispatch cost)
        key, k_u = jax.random.split(s.key)
        R4 = jax.random.uniform(k_u, (C, 4), dtype=dtype)
        u_shrink = R4[:, 0]

        # 1-2. the single fused evaluation
        xg = jnp.take(self.Xt, s.j, axis=0)  # (C, n) row gather
        delta = s.xprop - s.b0
        e = s.eta + xg * delta[:, None]
        ld_e = self._ld_eta(e, self.y, self.extra)
        if self.eval_cache == "scalar":
            lsum_e = self.reduce_fn(ld_e)
            dll = lsum_e - s.ld0
        else:
            dll = self.reduce_fn(ld_e - s.ld0)
        f = dll + (
            jnp.asarray(self._coord_lp(s.beta, s.j, s.xprop), dtype) - s.lp0
        )
        above = f > s.level

        stepping = s.phase == 0
        left = s.stepdir == 0

        # 3a. stepping-out transitions (this pass tested endpoint s.xprop)
        step_more_L = stepping & left & above & (s.budL > 0)
        L = jnp.where(step_more_L, s.L - s.w, s.L)
        budL = jnp.where(step_more_L, s.budL - 1, s.budL)
        done_L = stepping & left & ~step_more_L  # left endpoint is final
        step_more_R = stepping & ~left & above & (s.budR > 0)
        R = jnp.where(step_more_R, s.R + s.w, s.R)
        budR = jnp.where(step_more_R, s.budR - 1, s.budR)
        done_R = stepping & ~left & ~step_more_R  # both endpoints final

        stepdir = jnp.where(done_L, 1, s.stepdir)
        phase = jnp.where(done_R, 1, s.phase)
        enter_shrink = done_R

        # 3b. shrinkage transitions
        shrinking = s.phase == 1
        accept_move = shrinking & (f >= s.level) & active
        exhausted = shrinking & (f < s.level) & (
            s.n_shrink + 1 >= self.max_shrink
        ) & active
        rej = shrinking & (f < s.level)
        L = jnp.where(rej & (s.xprop < s.b0), s.xprop, L)
        R = jnp.where(rej & (s.xprop >= s.b0), s.xprop, R)
        n_shrink = jnp.where(shrinking, s.n_shrink + 1, s.n_shrink)

        # 4. commit.  accept-with-move: the evaluated e / ld(e) are the new
        #    state.  Shrink exhaustion commits b0 (state unchanged) — same
        #    fallback as slice_stepping_out's bounded loop.
        commit = accept_move | exhausted
        b_star = jnp.where(accept_move, s.xprop, s.b0)
        eta = jnp.where(accept_move[:, None], e, s.eta)
        if self.eval_cache == "scalar":
            ld0 = jnp.where(accept_move, lsum_e, s.ld0)
        else:
            ld0 = jnp.where(accept_move[:, None], ld_e, s.ld0)
        # beta[c, j_c] = b_star: a no-op write of b0 for non-committing lanes
        beta = self._commit_row(s.beta, s.j, b_star)

        logw = s.logw
        if adapt:
            # Robbins-Monro pull of log w_j toward ~3x the accepted move;
            # gated one-hot select touches only committing lanes' (c, j)
            # adapt only on accept-with-move commits: a shrink-exhausted
            # commit has move = 0 and would pull log w toward log(1e-6) —
            # a width death-spiral for sticky coordinates
            move = jnp.abs(b_star - s.b0)
            target = jnp.log(self.adapt_c * move + 1e-6)
            lw_j = jnp.take_along_axis(s.logw, s.j[:, None], axis=1)[:, 0]
            new_lw = (1.0 - self._adapt_rate) * lw_j + self._adapt_rate * target
            logw = self._commit_row(s.logw, s.j, new_lw, gate=accept_move)

        # coordinate / sweep bookkeeping
        nev_new = s.nev + active.astype(jnp.int32)
        j_next = jnp.where(commit, s.j + 1, s.j)
        sweep_done = commit & (j_next >= self.d)
        slot = jnp.where(sweep_done, sweep_count, n_sweeps)  # OOB => dropped
        draws, nevbuf = self._sweep_buffers(
            draws, nevbuf, rows, slot, beta, nev_new, sweep_done
        )
        sweep_count = jnp.where(sweep_done, sweep_count + 1, sweep_count)
        j_next = jnp.where(sweep_done, 0, j_next)

        # fresh automaton registers for lanes that committed; in two-phase
        # warmup a lane switches to the shrink-only kernel once ITS sweep
        # count crosses the stepout quota (per-lane: chains are free-running)
        so_eff = shrink_only
        if stepout_sweeps is not None and not shrink_only:
            so_eff = sweep_count >= stepout_sweeps
        reg = self._begin_coord(key, beta, logw, j_next, so_eff,
                                ubatch=R4[:, 1:4])

        def pick(name, old):
            return jnp.where(commit, reg[name], old)

        # non-commit proposal for the next pass:
        #   stepping: the (possibly moved) endpoint of the active direction
        #   entering/continuing shrinkage: uniform on the current (L, R)
        x_shrink = L + (R - L) * u_shrink
        in_shrink = (shrinking | enter_shrink) & ~commit
        xprop_nc = jnp.where(
            in_shrink, x_shrink, jnp.where(stepdir == 0, L, R)
        )

        # freeze INACTIVE lanes' automaton registers (see the identical
        # block in _pass_spec: idle lanes that burned their shrink budget
        # at a run boundary spuriously exhaust-committed b0 on resume,
        # freezing the post-wrap coordinate — the intercept)
        def keep(new, old):
            return jnp.where(active, new, old)

        new_state = FreeRunState(
            beta=beta, eta=eta, ld0=ld0, key=key, logw=logw,
            j=j_next,
            phase=keep(pick("phase", phase), s.phase),
            stepdir=keep(pick("stepdir", stepdir), s.stepdir),
            level=pick("level", s.level),
            L=keep(pick("L", L), s.L), R=keep(pick("R", R), s.R),
            budL=keep(pick("budL", budL), s.budL),
            budR=keep(pick("budR", budR), s.budR),
            b0=pick("b0", s.b0), lp0=pick("lp0", s.lp0),
            w=pick("w", s.w),
            xprop=keep(pick("xprop", xprop_nc), s.xprop),
            n_shrink=keep(pick("n_shrink", n_shrink), s.n_shrink),
            nev=nev_new,
        )
        return new_state, sweep_count, draws, nevbuf

    # -- the K-speculative pass --------------------------------------------

    def _pass_spec(self, s: FreeRunState, sweep_count, draws, nevbuf,
                   n_sweeps: int, adapt: bool, shrink_only: bool,
                   stepout_sweeps=None):
        """K target evaluations + automaton advance per chain per pass.

        The enabling fact: in Neal's shrinkage the ALL-REJECTIONS proposal
        path is deterministic given the uniforms — rejecting x moves the
        interval endpoint on whichever side of b0 x falls, a comparison
        that needs no target evaluation.  So x_1..x_K can be generated up
        front, all K targets evaluated in ONE fused (C, K, n) reduce that
        reads eta and the gathered X^T rows once, and the FIRST acceptor
        selected — its predecessors were genuinely rejected, so the
        committed draw has exactly the single-proposal kernel's
        distribution.  The same holds for stepping-out: the keep-stepping
        endpoint sequence L, L-w, L-2w, ... is deterministic, so a pass
        tests a K-endpoint battery (used during warmup).

        Throughput: the classic pass is HBM-bound (3 (C, n) streams, VPU
        ~10% busy on the log-density transcendentals), so the K-1 extra
        evaluations ride nearly free while passes-per-coordinate drops
        from the mean evaluation count (~2.8 at adapted widths) toward
        ~1.  Wasted speculative evaluations cost VPU only.  `nev` still
        counts ALGORITHMIC evaluations consumed (identical in law to the
        spec_k=1 engine), not speculative ones executed.
        """
        dtype = self.dtype
        K = self.spec_k
        C = s.beta.shape[0]
        rows = jnp.arange(C)
        active = sweep_count < n_sweeps

        key, k_u = jax.random.split(s.key)
        # ONE batched uniform block: K shrink proposals + the 3 uniforms
        # _begin_coord needs (level, position, stepout split)
        RU = jax.random.uniform(k_u, (C, K + 3), dtype=dtype)
        U = RU[:, :K]

        stepping = s.phase == 0
        left = s.stepdir == 0

        # -- speculative proposal batteries, (C, K) --
        # shrink: all-rejections chain (deterministic interval recursion)
        xs_sh, Ls_sh, Rs_sh = [], [], []
        Lc, Rc = s.L, s.R
        for k in range(K):
            x = Lc + (Rc - Lc) * U[:, k]
            xs_sh.append(x)
            Lc = jnp.where(x < s.b0, x, Lc)
            Rc = jnp.where(x >= s.b0, x, Rc)
            Ls_sh.append(Lc)
            Rs_sh.append(Rc)
        xs_sh = jnp.stack(xs_sh, 1)
        Ls_sh = jnp.stack(Ls_sh, 1)
        Rs_sh = jnp.stack(Rs_sh, 1)
        # stepping: endpoint battery in the active direction
        ks = jnp.arange(K, dtype=dtype)[None, :]
        x_step = jnp.where(
            left[:, None],
            s.L[:, None] - ks * s.w[:, None],
            s.R[:, None] + ks * s.w[:, None],
        )
        xs = jnp.where(stepping[:, None], x_step, xs_sh)

        # -- one fused K-proposal evaluation --
        deltas = xs - s.b0[:, None]  # (C, K)
        fprior = (
            jnp.asarray(self._coord_lp_k(s.beta, s.j, xs), dtype)
            - s.lp0[:, None]
        )  # (C, K)
        shrinking = s.phase == 1
        # >= 1 for active shrink lanes; clamped because inactive lanes keep
        # evaluating past their quota without ever committing
        rem = jnp.maximum(self.max_shrink - s.n_shrink, 0)
        eta_committed = None
        xg = None
        # documented fallback chain: pallas2 -> pallas -> xla.  A None from
        # _battery2_fn (odd chain count, VMEM overflow) drops to the n-tiled
        # one-read battery, whose grid over the observation axis fits any n;
        # a None from _battery_fn drops to the XLA broadcast path.
        # (pallas3's n budget is checked at construction and AUTO
        # selections resolve odd chain counts to "xla" at first init
        # (_resolve_battery); an EXPLICIT pallas3 request with C % 8 != 0
        # runs the BC=1 grid — correct but slow, the user's call.)
        battery3 = (
            self._battery3_fn(C) if self.battery_impl == "pallas3" else None
        )
        battery2 = (
            self._battery2_fn(C) if self.battery_impl == "pallas2" else None
        )
        battery = None
        if battery2 is None and self.battery_impl in ("pallas", "pallas2"):
            battery = self._battery_fn(C)
        lsum_abs = None  # fresh scalar sums, kept for the cache refresh
        if battery3 is not None:
            # 3-stream pass: in-kernel row gather + fused commit; no XLA
            # gather at all (s.j is scalar-prefetched into the index_map)
            scal = jnp.stack(
                [s.level, s.ld0, (shrinking & active).astype(dtype),
                 rem.astype(dtype)], axis=1)
            lsum_abs, eta_committed = battery3(s.j, s.eta, deltas, fprior,
                                               scal)
            dll = lsum_abs - s.ld0[:, None]
        elif battery2 is not None:
            # fused pass: battery eval + in-kernel eta commit; the
            # decision below is replayed on the identical lsum values
            xg = jnp.take(self.Xt, s.j, axis=0)  # (C, n) row gather
            scal = jnp.stack(
                [s.level, s.ld0, (shrinking & active).astype(dtype),
                 rem.astype(dtype)], axis=1)
            lsum_abs, eta_committed = battery2(s.eta, xg, deltas, fprior,
                                               scal)
            dll = lsum_abs - s.ld0[:, None]
        elif battery is not None:
            # one-read Pallas battery: (C, K) masked log-lik sums directly
            xg = jnp.take(self.Xt, s.j, axis=0)  # (C, n) row gather
            lsum_abs = battery(s.eta, xg, deltas)
            dll = lsum_abs - s.ld0[:, None]
        else:
            xg = jnp.take(self.Xt, s.j, axis=0)  # (C, n) row gather
            e = s.eta[:, None, :] + xg[:, None, :] * deltas[:, :, None]
            ld_e = self._ld_eta(e, self.y, self.extra)  # (C, K, n)
            if self.eval_cache == "scalar":
                lsum_abs = self.reduce_fn(ld_e)
                dll = lsum_abs - s.ld0[:, None]
            else:
                dll = self.reduce_fn(ld_e - s.ld0[:, None, :])
        f = dll + fprior  # (C, K)

        # -- stepping-out: consume the battery along the keep-stepping path --
        above = f > s.level[:, None]
        na = ~above
        m_na = jnp.where(na.any(1), jnp.argmax(na, 1), K).astype(jnp.int32)
        bud = jnp.where(left, s.budL, s.budR)
        moves = jnp.minimum(jnp.minimum(m_na, bud), K)  # w-steps taken
        done_dir = moves < K
        consumed_step = jnp.minimum(moves, K - 1) + 1
        movesf = moves.astype(dtype)
        L_step = jnp.where(left, s.L - movesf * s.w, s.L)
        R_step = jnp.where(left, s.R, s.R + movesf * s.w)
        budL = jnp.where(left, s.budL - moves, s.budL)
        budR = jnp.where(left, s.budR, s.budR - moves)
        done_L = stepping & left & done_dir
        done_R = stepping & ~left & done_dir
        stepdir = jnp.where(done_L, 1, s.stepdir)
        phase = jnp.where(done_R, 1, s.phase)

        # -- shrinkage: first acceptor in the battery --
        acc = f >= s.level[:, None]
        validk = jnp.arange(K, dtype=jnp.int32)[None, :] < rem[:, None]
        accv = acc & validk
        any_acc = accv.any(1)
        idx = jnp.argmax(accv, 1).astype(jnp.int32)
        consumed_sh = jnp.where(any_acc, idx + 1,
                                jnp.minimum(jnp.int32(K), rem))
        accept_move = shrinking & any_acc & active
        exhausted = shrinking & ~any_acc & (
            s.n_shrink + consumed_sh >= self.max_shrink
        ) & active
        last = jnp.clip(consumed_sh - 1, 0, K - 1)
        L_sh = jnp.take_along_axis(Ls_sh, last[:, None], 1)[:, 0]
        R_sh = jnp.take_along_axis(Rs_sh, last[:, None], 1)[:, 0]
        n_shrink = jnp.where(shrinking, s.n_shrink + consumed_sh, s.n_shrink)
        L = jnp.where(stepping, L_step, L_sh)
        R = jnp.where(stepping, R_step, R_sh)

        # -- commit --
        x_star = jnp.take_along_axis(xs, idx[:, None], 1)[:, 0]
        commit = accept_move | exhausted
        b_star = jnp.where(accept_move, x_star, s.b0)
        delta_star = jnp.where(accept_move, x_star - s.b0,
                               jnp.zeros((), dtype))
        if eta_committed is not None:
            # pallas2/pallas3 already applied eta += xg * delta_star in-kernel
            eta = eta_committed
        else:
            eta = s.eta + xg * delta_star[:, None]
        if self.eval_cache == "scalar":
            # refresh the cache with the accepted proposal's FRESH sum, not
            # the accumulated s.ld0 + dll_star: the accumulated form lets
            # f32 error random-walk per chain over thousands of commits,
            # which biases every subsequent slice test by a persistent
            # per-chain epsilon — observed on TPU as per-chain intercept
            # offsets (config #3: pooled intercept ESS plateaued at ~2.2k
            # across 100/200/300-sweep windows with lag-1 autocorr ~0.1,
            # the signature of between-chain mean variance).  The classic
            # _pass always stored the fresh sum; this restores parity.
            lsum_star = jnp.take_along_axis(lsum_abs, idx[:, None], 1)[:, 0]
            ld0 = jnp.where(accept_move, lsum_star, s.ld0)
        else:
            # per-observation cache: recompute at the committed eta (the
            # battery's (C, K, n) densities are reduction-fused, never
            # materialised).  spec_k is built for the scalar cache; this
            # path stays exact but pays one extra transcendental stream.
            ld0 = jnp.where(
                accept_move[:, None],
                self._ld_eta(eta, self.y, self.extra),
                s.ld0,
            )
        beta = self._commit_row(s.beta, s.j, b_star)

        logw = s.logw
        if adapt:
            move = jnp.abs(b_star - s.b0)
            target = jnp.log(self.adapt_c * move + 1e-6)
            lw_j = jnp.take_along_axis(s.logw, s.j[:, None], axis=1)[:, 0]
            new_lw = (1.0 - self._adapt_rate) * lw_j + self._adapt_rate * target
            logw = self._commit_row(s.logw, s.j, new_lw, gate=accept_move)

        consumed = jnp.where(stepping, consumed_step, consumed_sh)
        nev_new = s.nev + jnp.where(active, consumed, 0)
        j_next = jnp.where(commit, s.j + 1, s.j)
        sweep_done = commit & (j_next >= self.d)
        slot = jnp.where(sweep_done, sweep_count, n_sweeps)
        draws, nevbuf = self._sweep_buffers(
            draws, nevbuf, rows, slot, beta, nev_new, sweep_done
        )
        sweep_count = jnp.where(sweep_done, sweep_count + 1, sweep_count)
        j_next = jnp.where(sweep_done, 0, j_next)

        so_eff = shrink_only
        if stepout_sweeps is not None and not shrink_only:
            so_eff = sweep_count >= stepout_sweeps
        reg = self._begin_coord(key, beta, logw, j_next, so_eff,
                                ubatch=RU[:, K:K + 3])

        def pick(name, old):
            return jnp.where(commit, reg[name], old)

        # INACTIVE lanes (sweep quota filled; idling while slower chains
        # finish) must not advance their automaton registers: their
        # evaluations are discarded, but letting them shrink their
        # interval / burn their shrink budget while idle meant that at
        # the NEXT run's first pass they resumed with rem=0 and
        # spuriously exhaust-committed b0 — and since an idle lane
        # always sits on the first coordinate after its sweep wrapped
        # (j=0), the INTERCEPT froze for every chain that idled >=
        # max_shrink evaluations in a boundary tail.  At pod scale with
        # thin=1 collection (149 boundaries) this froze j=0 for 43% of
        # 4096 chains (pooled R-hat 14; results/round4_pod_diag.log).
        # Freezing the registers keeps the lane's coordinate draw intact
        # across the boundary — it resumes exactly where it paused.
        def keep(new, old):
            return jnp.where(active, new, old)

        new_state = FreeRunState(
            beta=beta, eta=eta, ld0=ld0, key=key, logw=logw,
            j=j_next,
            phase=keep(pick("phase", phase), s.phase),
            stepdir=keep(pick("stepdir", stepdir), s.stepdir),
            level=pick("level", s.level),
            L=keep(pick("L", L), s.L), R=keep(pick("R", R), s.R),
            budL=keep(pick("budL", budL), s.budL),
            budR=keep(pick("budR", budR), s.budR),
            b0=pick("b0", s.b0), lp0=pick("lp0", s.lp0),
            w=pick("w", s.w),
            xprop=pick("xprop", s.xprop),  # unused in spec mode
            n_shrink=keep(pick("n_shrink", n_shrink), s.n_shrink),
            nev=nev_new,
        )
        return new_state, sweep_count, draws, nevbuf

    # -- runs -------------------------------------------------------------

    def _run(self, state: FreeRunState, n_sweeps: int, adapt: bool,
             shrink_only: bool, stepout_sweeps=None):
        C = state.beta.shape[0]
        draws0 = jnp.zeros((C, n_sweeps, self.d), self.dtype)
        nevbuf0 = jnp.zeros((C, n_sweeps), jnp.int32)

        def cond(carry):
            _, sweep_count, _, _ = carry
            return jnp.any(sweep_count < n_sweeps)

        def body(carry):
            s, sweep_count, draws, nevbuf = carry
            if self.spec_k > 1:
                return self._pass_spec(s, sweep_count, draws, nevbuf,
                                       n_sweeps, adapt, shrink_only,
                                       stepout_sweeps)
            return self._pass(s, sweep_count, draws, nevbuf, n_sweeps,
                              adapt, shrink_only, stepout_sweeps)

        state, _, draws, nevbuf = lax.while_loop(
            cond, body, (state, jnp.zeros((C,), jnp.int32), draws0, nevbuf0)
        )
        return state, draws, nevbuf

    def _run_pass_block(self, state: FreeRunState, sweep_count, *,
                        n_sweeps: int, n_passes: int, adapt: bool,
                        shrink_only: bool, stepout_sweeps=None,
                        draws=None, nevbuf=None):
        """Advance by at most ``n_passes`` device passes toward a quota of
        ``n_sweeps`` completed sweeps per chain.

        Unlike :meth:`_run`, the loop condition also bounds the pass count
        and ``sweep_count`` is a carried argument, so a long run can be
        split into dispatches of bounded wall-clock (remote runtimes
        enforce per-dispatch RPC deadlines).  Sweep-granular dispatching
        pays the cross-chain sweep tail (the slowest lane's evaluation
        count) on EVERY dispatch; a pass-granular dispatch pays it once at
        the end of the whole run — the pod-scale mode.

        ``draws``/``nevbuf`` optionally carry REAL collection buffers
        ((C, n_sweeps, d) / (C, n_sweeps)) across dispatches (the
        :meth:`run_passes` collection mode); when None, dummy 1-slot
        buffers make this a pure advance (the warmup mode)."""
        C = state.beta.shape[0]
        collect = draws is not None
        if draws is None:
            draws = jnp.zeros((C, 1, self.d), self.dtype)
        if nevbuf is None:
            nevbuf = jnp.zeros((C, draws.shape[1]), jnp.int32)

        def cond(carry):
            _, sweep_count, _, _, p = carry
            return jnp.any(sweep_count < n_sweeps) & (p < n_passes)

        def body(carry):
            s, sweep_count, draws, nevbuf, p = carry
            step = self._pass_spec if self.spec_k > 1 else self._pass
            s, sweep_count, draws, nevbuf = step(
                s, sweep_count, draws, nevbuf, n_sweeps, adapt, shrink_only,
                stepout_sweeps
            )
            return s, sweep_count, draws, nevbuf, p + 1

        state, sweep_count, draws, nevbuf, _ = lax.while_loop(
            cond, body,
            (state, sweep_count, draws, nevbuf, jnp.zeros((), jnp.int32)),
        )
        if collect:
            return state, sweep_count, draws, nevbuf
        return state, sweep_count

    def run_passes(self, state: FreeRunState, sweep_count, draws, nevbuf,
                   n_sweeps: int, n_passes: int):
        """Pass-bounded, barrier-free sampling collection (pod mode).

        Advances at most ``n_passes`` device passes toward ``n_sweeps``
        completed sweeps per chain, recording every completed sweep's
        draw into the CARRIED ``draws`` (C, n_sweeps, d) buffer (device-
        resident across dispatches; pass ``None`` to allocate).  Unlike
        chunked :meth:`run` / thin=1 :meth:`run_thinned` — which impose a
        full cross-chain barrier at every chunk boundary, paying the
        slowest lane's tail per chunk (~10-15% of pod wall-clock at
        C=4096) — chains here run FREELY across sweep boundaries for the
        whole collection; the single tail is paid once at the very end.
        Call repeatedly until ``(sweep_count >= n_sweeps).all()``:

            sc, draws, nevbuf = None, None, None
            while True:
                state, sc, draws, nevbuf = eng.run_passes(
                    state, sc, draws, nevbuf, n_sweeps, n_passes)
                if (np.asarray(sc) >= n_sweeps).all():
                    break

        Identical in law to :meth:`run` (same per-pass kernel; same
        drop-mode sweep recording)."""
        C = int(state.beta.shape[0])
        if sweep_count is None:
            sweep_count = jnp.zeros((C,), jnp.int32)
        if draws is None:
            draws = jnp.zeros((C, n_sweeps, self.d), self.dtype)
        if nevbuf is None:
            nevbuf = jnp.zeros((C, n_sweeps), jnp.int32)
        key_ = ("run_passes", n_sweeps, n_passes, C)
        fn = self._run_cache.get(key_)
        if fn is None:
            # draws rides positionally WITH donation: carried as an
            # undonated kwarg, each dispatch holds input + output copies of
            # the (C, n_sweeps, d) buffer (~2x peak, ~5 GB at the
            # C=4096/n_sweeps=150/d=1000 pod scale) — the sharded variant
            # donates it for exactly this reason (freerun_sharded.py).
            def impl(st, sc, dr, nb):
                return self._run_pass_block(
                    st, sc, n_sweeps=n_sweeps, n_passes=n_passes,
                    adapt=False, shrink_only=self.shrink_only,
                    draws=dr, nevbuf=nb,
                )

            fn = jax.jit(impl, donate_argnums=(2,))
            self._run_cache[key_] = fn
        return fn(state, sweep_count, draws, nevbuf)

    def _auto_stepout(self, n_sweeps: int) -> int:
        """Default stepping-out quota for two-phase warmup: a few full
        stepping-out sweeps to locate each coordinate's scale, then the
        shrink-only kernel (with adaptation continuing) for the rest.
        Rationale: a full stepping-out coordinate costs >= 3 device passes
        (left endpoint battery + right endpoint battery + >= 1 shrink)
        even when widths are already well-sized, vs ~1 pass shrink-only —
        and the Robbins-Monro width pull is identical in both modes, so
        only the first few sweeps (where w may be off by orders of
        magnitude and stepping-out's linear walk finds the scale in one
        visit) benefit from the full schedule.  Warmup draws are
        discarded, so the kernel mix does not touch the collected chain's
        law — and the shrink-only kernel is itself exact (m=1)."""
        return min(n_sweeps, max(3, min(10, n_sweeps // 5)))

    def warmup_passes(self, state: FreeRunState, sweep_count, n_sweeps: int,
                      n_passes: int, stepout_sweeps: Optional[int] = None):
        """Advance adaptive warmup by at most ``n_passes`` device passes
        toward ``n_sweeps`` completed warmup sweeps per chain.

        Returns ``(state, sweep_count)``; call repeatedly (passing the
        returned ``sweep_count`` back in) until
        ``(sweep_count >= n_sweeps).all()``.  Identical in law to a single
        ``warmup(state, n_sweeps)`` call — same per-pass kernel, same PRNG
        consumption — but each dispatch's wall-clock is bounded by the pass
        budget instead of by the slowest chain's sweep, which is what keeps
        4096-chain warmups inside remote-dispatch RPC deadlines without
        paying the cross-chain tail once per sweep.

        ``stepout_sweeps`` as in :meth:`warmup` (two-phase schedule; the
        per-lane switch keys off the carried ``sweep_count``, so chunked
        pass-bounded dispatches see the same schedule as one big call)."""
        if stepout_sweeps is None:
            stepout_sweeps = self._auto_stepout(n_sweeps)
        key_ = ("passes", n_sweeps, n_passes, int(stepout_sweeps),
                int(state.beta.shape[0]))
        fn = self._run_cache.get(key_)
        if fn is None:
            fn = jax.jit(partial(
                self._run_pass_block, n_sweeps=n_sweeps, n_passes=n_passes,
                adapt=True, shrink_only=False,
                stepout_sweeps=int(stepout_sweeps),
            ))
            self._run_cache[key_] = fn
        return fn(state, sweep_count)

    def run(self, state: FreeRunState, n_sweeps: int):
        """Advance every chain by ``n_sweeps`` completed Gibbs sweeps.

        Returns (state, draws (C, n_sweeps, d), nev_at_sweep (C, n_sweeps))
        — nev_at_sweep[c, s] is chain c's CUMULATIVE target-evaluation
        count at the completion of its s-th sweep in this run, so honest
        per-sweep counts are its first difference (against the pre-run
        ``state.nev``)."""
        return self._run_cached(state, n_sweeps, adapt=False,
                                shrink_only=self.shrink_only)

    # -- thinned collection with streaming moments (pod-scale mode) --------

    def _run_thinned_impl(self, state: FreeRunState, moments, n_outer: int,
                          thin: int, shrink_only: bool):
        """lax.scan over n_outer blocks of `thin` free-running sweeps each;
        every block's draws are merged into per-chain Welford moments on
        device (chunk-merge form: within-block centering keeps the update
        float32-safe) and only the block's LAST draw is retained — memory is
        O(C*(n_outer + thin)*d) instead of O(C*n_outer*thin*d).  The merge
        runs once per `thin` sweeps, ~3*d passes of (C, n) traffic each, so
        its (C, d)-sized streams are free by comparison."""

        def outer(carry, _):
            st, (cnt, mean, m2) = carry
            st, draws, _ = self._run(st, thin, adapt=False,
                                     shrink_only=shrink_only)
            mu_c = jnp.mean(draws, axis=1)  # (C, d)
            m2_c = jnp.sum((draws - mu_c[:, None, :]) ** 2, axis=1)
            cnt2 = cnt + float(thin)
            delta = mu_c - mean
            ratio = (float(thin) / cnt2)[:, None]
            mean2 = mean + delta * ratio
            m22 = m2 + m2_c + delta * delta * (cnt * float(thin) / cnt2)[:, None]
            return (st, (cnt2, mean2, m22)), draws[:, -1]

        (state, mom), kept = lax.scan(
            outer, (state, moments), None, length=n_outer
        )
        kept = jnp.swapaxes(kept, 0, 1)  # (n_outer, C, d) -> (C, n_outer, d)
        return state, mom, kept

    def run_thinned(self, state: FreeRunState, n_outer: int, thin: int,
                    moments=None):
        """Advance chains by ``n_outer * thin`` sweeps, keeping every
        ``thin``-th draw and streaming per-chain Welford moments on device —
        the pod-scale collection mode (mirrors CGGibbs.run_thinned; feeds
        parallel.pooled.pooled_summary).

        Returns (state, moments, draws (C, n_outer, d), n_evals (C,)) —
        ``moments`` is a ChainMoments with per-chain count (C,), and
        ``n_evals`` is the cumulative per-chain evaluation counter."""
        from .parallel.pooled import ChainMoments

        C = int(state.beta.shape[0])
        if moments is None:
            moments = ChainMoments(
                count=jnp.zeros((C,), self.dtype),
                mean=jnp.zeros((C, self.d), self.dtype),
                m2=jnp.zeros((C, self.d), self.dtype),
            )
        key_ = ("thinned", n_outer, thin, self.shrink_only, C)
        fn = self._run_cache.get(key_)
        if fn is None:
            def impl(st, mom):
                st, (cnt, mean, m2), draws = self._run_thinned_impl(
                    st, (mom.count, mom.mean, mom.m2), n_outer, thin,
                    self.shrink_only,
                )
                return st, ChainMoments(cnt, mean, m2), draws

            fn = jax.jit(impl)
            self._run_cache[key_] = fn
        state, moments, draws = fn(state, moments)
        return state, moments, draws, state.nev

    def warmup(self, state: FreeRunState, n_sweeps: int,
               stepout_sweeps: Optional[int] = None):
        """Adaptive warmup: per-(chain, coordinate) slice widths pulled
        toward ~adapt_c x the accepted move (Robbins-Monro in log space),
        FROZEN afterwards — identical policy to CGGibbs.warmup.

        Two-phase schedule: the first ``stepout_sweeps`` sweeps (default
        :meth:`_auto_stepout`; round-3 warmup used the full schedule
        throughout and was ~4x the per-sweep sampling cost at pod scale)
        run the full stepping-out kernel; the rest run the cheap
        shrink-only kernel with adaptation continuing.  Pass
        ``stepout_sweeps=n_sweeps`` for the round-3 behavior, ``0`` for
        shrink-only-throughout (e.g. resuming an already-adapted state)."""
        if stepout_sweeps is None:
            stepout_sweeps = self._auto_stepout(n_sweeps)
        return self._run_cached(state, n_sweeps, adapt=True,
                                shrink_only=False,
                                stepout_sweeps=int(stepout_sweeps))

    def _run_cached(self, state, n_sweeps, adapt, shrink_only,
                    stepout_sweeps=None):
        key_ = (n_sweeps, adapt, shrink_only, stepout_sweeps,
                int(state.beta.shape[0]))
        fn = self._run_cache.get(key_)
        if fn is None:
            fn = jax.jit(partial(self._run, n_sweeps=n_sweeps, adapt=adapt,
                                 shrink_only=shrink_only,
                                 stepout_sweeps=stepout_sweeps))
            self._run_cache[key_] = fn
        state, draws, nevbuf = fn(state)
        return state, draws, nevbuf

    def sample(self, key, n_samples: int, n_chains: int = 1, chunk_size: int = 0,
               progress=None):
        """Init from the prior then collect n_samples sweeps per chain.
        Returns (betas (C, n_samples + 1, d), n_evals (C,), state) — row 0
        is the init draw, matching CGGibbs.sample."""
        state = self.init(key, n_chains)
        parts = [np.asarray(state.beta)[:, None, :]]
        if chunk_size <= 0:
            chunk_size = n_samples
        done = 0
        while done < n_samples:
            step = min(chunk_size, n_samples - done)
            state, draws, _ = self.run(state, step)
            parts.append(np.asarray(draws))
            done += step
            if progress is not None:
                progress(done, n_samples)
        return np.concatenate(parts, axis=1), np.asarray(state.nev), state
