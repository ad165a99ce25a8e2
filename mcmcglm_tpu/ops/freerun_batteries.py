"""Pallas proposal-battery kernels for the free-running CGGibbs engine.

A "battery" evaluates the K speculative slice proposals of one freerun
pass (freerun.py ``_pass_spec``) for all C chains in a single fused TPU
kernel.  Three implementations, in increasing stream-count aggression:

``build_battery``  ("pallas")
    One-read (C, K) masked log-likelihood sums: grid over (chains,
    observations), K proposals unrolled in-register per tile, the (C, K)
    accumulator resident in VMEM across the observation grid.
``build_battery2`` ("pallas2")
    The battery PLUS the eta commit fused in-kernel: the first-acceptor
    decision is replayed on the in-kernel sums and the committed eta
    written out (~6 -> ~4 (C, n) HBM streams per pass).
``build_battery3`` ("pallas3")
    The 3-stream pass: the per-chain X^T row gather also moves in-kernel
    via a scalar-prefetch index_map over a (d, S, 128) layout (Mosaic's
    tiling rule rejects single-row DMA from a 2-D (d, n) array; the 3-D
    reshape moves the gathered dim out of the (8, 128) tiling pair).
    Streams per pass: read eta + read X rows + write eta.

``battery_lowerable`` probes, without invoking the backend compiler,
whether the selected kernel's primitives lower on this backend (Mosaic
has no lgamma/erf/expm1 — see Family.log_density_eta_rel and the
mosaic-kernel notes in results/README.md).

Builders take the engine (a ``freerun.FreeRunCGGibbs``) and the chain
count C, returning ``fn`` or ``None`` when the layout cannot serve this
C (odd chain counts, VMEM overflow) — the engine's fallback chain
(pallas2 -> pallas -> xla) handles a ``None``.  All kernel maths is
bit-identical to the pre-split in-engine versions (guarded by the
bitwise tests in tests/test_freerun_spec.py).

These kernels have no counterpart in the R reference — they are the TPU
realisation of its single O(n) slice evaluation (R/glm_utils.R:187-218)
batched over chains and speculative proposals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "build_battery",
    "build_battery2",
    "build_battery3",
    "battery_lowerable",
]


def build_battery(eng, C: int):
    """The one-read battery kernel for C chains (see module docstring).

    Computes lsum[c, k] = sum_i mask_i * ld(eta[c,i] + xg[c,i] *
    deltas[c,k]) over the padded observation axis with ONE HBM read of
    eta and xg: grid (C/BC, n_pad/BN), the K proposals unrolled
    in-register per (BC, BN) tile, (C, K) accumulator resident in VMEM
    across the n-grid.  The XLA formulation of the same battery streams
    eta/xg once per proposal (scripts/battery_probe.py) — on an
    HBM-bound pass that forfeits the entire speculation win.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = eng.spec_k
    n_pad = int(eng.Xt.shape[1])
    BN = eng._battery_bn
    BC = next((b for b in (128, 64, 32, 16, 8) if C % b == 0), None)
    if BC is None:
        return None  # odd chain counts: caller falls back to XLA
    ld_fn = eng._ld_eta
    extra = {k: float(v) for k, v in eng.extra.items()}
    y2 = eng._y2
    m2 = eng._m2

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

    return fn


def build_battery2(eng, C: int):
    """The fused battery + eta-commit kernel.

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
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = eng.spec_k
    n_pad = int(eng.Xt.shape[1])
    # VMEM budget: unlike build_battery this kernel holds whole (BC, n_pad)
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
    ld_fn = eng._ld_eta
    extra = {k: float(v) for k, v in eng.extra.items()}
    y2 = eng._y2
    m2 = eng._m2

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

    return fn


def build_battery3(eng, C: int):
    """The 3-stream battery: in-kernel X^T row gather via scalar-prefetch
    index_map + fused eta commit.

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
    exactly as in build_battery2; outputs (lsum (C, K),
    eta_new (C, S, 128))."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = eng.spec_k
    S, L = eng._eta3
    # chains per grid step: 8 default (BC=1 measured slower than the
    # classic pass; the pass-budget probe showed the in-kernel row
    # gather is DMA-LATENCY-bound, not bandwidth-bound, so batching
    # more row DMAs per step can overlap them further — override via
    # _bc3 for probing)
    BC = getattr(eng, "_bc3", None) or (8 if C % 8 == 0 else 1)
    if C % BC != 0:
        raise ValueError(f"_bc3={BC} does not divide C={C}")
    ld_fn = eng._ld_eta
    extra = {k: float(v) for k, v in eng.extra.items()}
    y3 = eng._y3
    m3 = eng._m3
    Xt3 = eng._Xt3

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

    return fn


def battery_lowerable(eng) -> bool:
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
    C, K = 8, eng.spec_k
    f32 = jnp.float32
    n_pad = int(np.prod(eng.Xt.shape[1:]))
    try:
        if eng.battery_impl == "pallas3":
            fn = eng._battery3_fn(C)
            S, L = eng._eta3
            args = (
                jax.ShapeDtypeStruct((C,), jnp.int32),
                jax.ShapeDtypeStruct((C, S, L), f32),
                jax.ShapeDtypeStruct((C, K), f32),
                jax.ShapeDtypeStruct((C, K), f32),
                jax.ShapeDtypeStruct((C, 4), f32),
            )
        elif eng.battery_impl == "pallas2":
            fn = eng._battery2_fn(C)
            args = (
                jax.ShapeDtypeStruct((C, n_pad), f32),
                jax.ShapeDtypeStruct((C, n_pad), f32),
                jax.ShapeDtypeStruct((C, K), f32),
                jax.ShapeDtypeStruct((C, K), f32),
                jax.ShapeDtypeStruct((C, 4), f32),
            )
        else:
            fn = eng._battery_fn(C)
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
            f"auto battery selection: {eng.battery_impl!r} failed to "
            f"lower ({type(exc).__name__}: {exc}); falling back to the "
            "XLA battery",
            RuntimeWarning,
            stacklevel=3,
        )
        return False
    finally:
        eng._battery_cache.clear()  # drop the C=8 probe builds


def configure_battery(eng, battery_impl, *, user_reduce_fn, dtype,
                      obs_weights, ow, x_storage):
    """Validate + auto-select the K-speculative battery implementation
    and install its operand layouts on the engine (called once from the
    FreeRunCGGibbs constructor; see the class docstring in freerun.py
    and the kernel docstrings below for the design rationale and the
    measured stream counts).

    Sets: eng.battery_impl, eng._battery_cache, eng._eta3 (+ the padded
    Xt/y/mask/reduce_fn operands and their 2-D/3-D kernel views),
    eng._battery_auto, eng._battery_resolved.
    """
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
        jnp.ndim(v) == 0 for v in eng.extra.values()
    )
    pallas_ok = (
        eng.spec_k > 1
        and eng.eval_cache == "scalar"
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
            bn_a = 2048 if eng.n >= 2048 else 256
            n_pad_a = -(-eng.n // bn_a) * bn_a
            fits3 = 2 * (24 * n_pad_a) * 4 <= 12 * 1024 * 1024
            battery_impl = "pallas3" if fits3 else "pallas2"
        else:
            battery_impl = "xla"
    eng.battery_impl = battery_impl
    eng._battery_cache: dict = {}
    eng._eta3 = None  # (S, L) when state eta is carried 3-D (pallas3)
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
        bn = 2048 if eng.n >= 2048 else 256
        eng._battery_bn = bn
        n_pad = -(-eng.n // bn) * bn
        pad = n_pad - eng.n
        w_vec = ow if obs_weights is not None else jnp.ones((eng.n,), dtype)
        eng._mask = jnp.pad(w_vec, (0, pad))
        eng.Xt = jnp.pad(eng.Xt, ((0, 0), (0, pad)))
        eng.y = jnp.pad(eng.y, (0, pad), constant_values=1.0)
        if eng.offset is not None:
            eng.offset = jnp.pad(eng.offset, (0, pad))
        mask = eng._mask
        eng.reduce_fn = lambda t: jnp.sum(
            jnp.where(mask != 0, t * mask, 0.0), axis=-1
        )
        # (1, n_pad) operand views built OUTSIDE any trace: _battery_fn
        # may first run while tracing a jitted pass, and reshaping there
        # would capture (and leak) trace-local tracers in its cache
        eng._y2 = eng.y.reshape(1, n_pad)
        eng._m2 = eng._mask.reshape(1, n_pad)
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
            eng._eta3 = (S, L)
            # bf16 storage halves the X-row stream of the 3-stream
            # pass; values are ALREADY bf16-rounded (see x_storage
            # above), so the cast is lossless here and the kernel's
            # f32 upcast reproduces identical arithmetic
            eng._Xt3 = eng.Xt.reshape(eng.d, S, L).astype(
                jnp.bfloat16 if x_storage == "bf16" else dtype
            )
            eng._y3 = eng.y.reshape(1, S, L)
            eng._m3 = eng._mask.reshape(1, S, L)
    eng._battery_auto = battery_auto
    # auto selection is finalised per chain count at first init():
    # every Pallas battery's block layout needs C % 8 == 0 (pallas3's
    # BC=1 fallback measured SLOWER than the classic pass), so auto
    # demotes to "xla" for odd chain counts — see _resolve_battery.
    eng._battery_resolved = False
    if (
        battery_auto
        and eng.battery_impl in ("pallas", "pallas2", "pallas3")
        and not eng._battery_lowerable()
    ):
        # a family whose log density uses a primitive Mosaic cannot
        # lower (erf for probit links, arbitrary user-registered
        # densities, ...) would crash at first trace: the auto
        # selection probes lowerability up front (a compile-free
        # eval_shape of the kernel) and quietly drops to the XLA
        # battery.  Explicitly requested Pallas impls still fail
        # loudly at first use — the user asked for that kernel.
        eng.battery_impl = "xla"
        eng._eta3 = None  # 2-D eta layout for the XLA pass

