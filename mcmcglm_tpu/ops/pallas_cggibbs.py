"""Fused Pallas TPU kernel for the CGGibbs coordinate update.

The north-star kernel (BASELINE.json: "the CGGibbs coordinate-wise sampler
with its O(1) incremental linear-predictor update becomes a fused Pallas
kernel"): for a block of chains, the ENTIRE slice-sampling coordinate update
— current log-density caching, stepping-out, shrinkage, every target
evaluation, and the final incremental eta commit — executes inside one
kernel with eta resident in VMEM.

Why this is the speed-of-light design: the XLA-level engine streams
eta (C, n) and ld_cur (C, n) from HBM once per *slice evaluation* (~5-8
evaluations per coordinate).  This kernel reads eta once and writes it once
per *coordinate*; all intermediate evaluations hit VMEM at on-chip
bandwidth.  HBM traffic per coordinate drops from ~2·evals·C·n·4B to
2·C·n·4B — about 7x less — turning the sampler from HBM-bound to
VPU-bound.

Random numbers use the TPU per-core PRNG (pltpu.prng_seed /
prng_random_bits), seeded per (kernel invocation, chain-block) from a
deterministic (base_seed, sweep, coordinate) triple: runs are reproducible
for a given seed, but the stream differs from the jax.random-based XLA
engine — equivalence tests are distributional, not bitwise.

Restrictions (fall back to the XLA engine otherwise): iid priors (the
coordinate prior delta must be an elementwise function of the proposal),
n padded to a lane multiple and small enough that a (block, n) f32 tile
fits VMEM three times over.
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_fused_coord_update", "make_fused_sweep", "MAX_FUSED_N"]

MAX_FUSED_N = 65536  # (8, 64k) f32 x ~4 live tiles ~ 8 MB VMEM


def _sel(mask, a, b):
    # lax.select instead of jnp.where: interpret-mode lowering of the
    # jnp.where closed_call inside Pallas while bodies crashes on jax 0.9
    return lax.select(mask, a, b)


def _uniform(shape):
    """U(0,1) from the per-core PRNG: 24 mantissa bits, clamped away from 0.

    prng_random_bits yields int32; bitcast to uint32 BEFORE shifting — an
    arithmetic shift of negative bits would fold half the stream onto the
    clamp value."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic lacks uint32->f32 casts: shift to 23 bits (always positive),
    # reinterpret as int32, then cast.
    bits23 = pltpu.bitcast(bits >> 9, jnp.int32)
    u = bits23.astype(jnp.float32) * jnp.float32(1.0 / (1 << 23))
    return jnp.maximum(u, jnp.float32(1e-12))


def make_fused_coord_update(
    ld_eta: Callable,  # (eta_tile, y_tile) -> per-obs log density tile
    prior_logpdf: Callable,  # (b) -> elementwise log prior (iid marginal)
    n_chains: int,
    n_padded: int,
    block_chains: int = 8,
    max_stepouts: int = 128,
    max_shrink: int = 64,
    interpret: bool = False,
):
    """Build the fused coordinate-update function.

    Returns ``update(eta, beta_j, x_j, y, seed, w) -> (eta', beta_j', n_evals)``
    with shapes eta (C, n), beta_j (C,), x_j (n,), y (n,), seed int32 scalar,
    w f32 scalar.
    """
    if n_chains % block_chains:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by block_chains={block_chains}"
        )
    if n_padded % 128:
        raise ValueError(f"n_padded={n_padded} must be a multiple of 128")
    if n_padded > MAX_FUSED_N:
        raise ValueError(f"n_padded={n_padded} exceeds MAX_FUSED_N={MAX_FUSED_N}")
    BC = block_chains
    grid = (n_chains // BC,)

    def kernel(seed_ref, w_ref, eta_ref, bj_ref, xj_ref, y_ref,
               eta_out, bj_out, nev_out, ld0_ref):
        # stride the stream by the grid size so (coordinate, chain-block)
        # pairs never share a seed (seed+program_id alone would collide:
        # coord j block 1 == coord j+1 block 0)
        pltpu.prng_seed(seed_ref[0] * jnp.int32(grid[0]) + pl.program_id(0))
        w = w_ref[0]
        eta = eta_ref[:]          # (BC, n)
        xj = xj_ref[:]            # (1, n)
        yv = y_ref[:]             # (1, n)
        b0 = bj_ref[:]            # (BC, 1)
        ld0_ref[:] = ld_eta(eta, yv)
        lp0 = prior_logpdf(b0)

        def g(b):  # (BC, 1) -> (BC, 1) relative log potential
            e = eta + xj * (b - b0)
            dll = jnp.sum(ld_eta(e, yv) - ld0_ref[:], axis=1, keepdims=True)
            return dll + (prior_logpdf(b) - lp0)

        # slice level: log y = -Exp(1)
        level = jnp.log(_uniform((BC, 1)))

        # initial interval, randomly positioned (Neal 2003 fig 3)
        u = _uniform((BC, 1))
        L = b0 - w * u
        R = L + w
        uj = _uniform((BC, 1))
        J = jnp.floor(uj * max_stepouts).astype(jnp.int32)
        K = (max_stepouts - 1) - J

        def stepout(end0, budget, direction):
            # masks carried as int32: Mosaic cannot legalize i1 vectors in
            # scf.while carries
            def cond(c):
                _, _, active, _ = c
                return jnp.max(active) > 0

            def body(c):
                end, budget, _, nev = c
                f = g(end)
                active = (f > level) & (budget > 0)
                end = _sel(active, end + direction * w, end)
                budget = _sel(active, budget - 1, budget)
                return end, budget, active.astype(jnp.int32), nev + 1

            end, _, _, nev = lax.while_loop(
                cond, body, (end0, budget, jnp.ones((BC, 1), jnp.int32),
                             jnp.zeros((), jnp.int32))
            )
            return end, nev

        L, nL = stepout(L, J, jnp.float32(-1.0))
        R, nR = stepout(R, K, jnp.float32(1.0))

        # shrinkage (accepted carried as int32, see stepout note)
        def shrink_cond(c):
            _, _, _, accepted, it = c
            return (jnp.min(accepted) < 1) & (it < max_shrink)

        def shrink_body(c):
            L, R, bnew, accepted, it = c
            acc = accepted > 0
            u = _uniform((BC, 1))
            x1 = L + (R - L) * u
            f = g(x1)
            ok = f >= level
            newly = ok & (~acc)
            bnew = _sel(newly, x1, bnew)
            rej = (~ok) & (~acc)
            L = _sel(rej & (x1 < b0), x1, L)
            R = _sel(rej & (x1 >= b0), x1, R)
            return L, R, bnew, (acc | ok).astype(jnp.int32), it + 1

        _, _, bnew, accepted, n_shrink = lax.while_loop(
            shrink_cond, shrink_body,
            (L, R, b0, jnp.zeros((BC, 1), jnp.int32), jnp.zeros((), jnp.int32)),
        )
        bnew = _sel(accepted > 0, bnew, b0)

        eta_out[:] = eta + xj * (bnew - b0)
        bj_out[:] = bnew
        nev_out[:] = jnp.broadcast_to(nL + nR + n_shrink, (BC, 1))

    def update(eta, beta_j, x_j, y, seed, w):
        C, n = eta.shape
        out_shapes = (
            jax.ShapeDtypeStruct((C, n), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
        )
        eta2, bj2, nev = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # w
                pl.BlockSpec((BC, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BC, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((BC, n), jnp.float32)],
            input_output_aliases={2: 0},
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            jnp.asarray([seed], jnp.int32).reshape(1),
            jnp.asarray([w], jnp.float32).reshape(1),
            eta,
            beta_j.reshape(C, 1).astype(jnp.float32),
            x_j.reshape(1, n).astype(jnp.float32),
            y.reshape(1, n).astype(jnp.float32),
        )
        return eta2, bj2[:, 0], nev[:, 0]

    return update


def make_fused_sweep(
    ld_eta: Callable,
    prior_logpdf: Callable,
    n_chains: int,
    d: int,
    n_padded: int,
    block_chains: int = 8,
    max_stepouts: int = 128,
    max_shrink: int = 64,
    interpret: bool = False,
):
    """Whole-sweep fused CGGibbs: ONE pallas_call per Gibbs sweep.

    Measurement motivated (round 1, TPU v5e, p=1000 n=10k C=64): a
    per-coordinate pallas_call spends ~2 ms per coordinate against ~0.36 ms
    for the XLA engine — per-call overhead dominates when each call touches
    only (C, n) elements.  This kernel amortises it to one call per sweep
    using a (chain_blocks, d) grid with the coordinate axis innermost:

      * eta and the cached per-observation log densities persist in
        VMEM-resident output/scratch buffers across the entire coordinate
        axis — HBM sees one eta read and one write per SWEEP;
      * rows of X^T arrive through the Pallas pipeline emitter (automatic
        double-buffered DMA), shaped (d, 1, n) so each block slices only
        the untiled batch dimension (Mosaic rejects sub-tile slices of the
        sublane dim — "must be aligned to tiling");
      * beta stays a full (BC, d) tile; the j-th column is read/written via
        one-hot MXU contractions because dynamic LANE indexing is illegal
        in Mosaic.

    Returns ``sweep(eta, beta, Xt3, y, seed, w) -> (eta', beta', n_evals)``
    with eta (C, n), beta (C, d), Xt3 (d, 1, n), y (n,).
    """
    if n_chains % block_chains:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by block_chains={block_chains}"
        )
    if n_padded % 128:
        raise ValueError(f"n_padded={n_padded} must be a multiple of 128")
    BC = block_chains
    n_blocks = n_chains // BC
    grid = (n_blocks, d)

    def kernel(seed_ref, w_ref, eta_ref, beta_ref, y_ref, xj_ref,
               eta_out, beta_out, nev_out, ld0_ref, nev_acc):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # distinct PRNG stream per (sweep, chain-block, coordinate)
        pltpu.prng_seed(seed_ref[0] * jnp.int32(n_blocks * d) + i * d + j)
        w = w_ref[0]
        yv = y_ref[:]               # (1, n)
        xj = xj_ref[0]              # (1, n)

        @pl.when(j == 0)
        def _():
            # new chain block: seed the persistent buffers
            eta_out[:] = eta_ref[:]
            beta_out[:] = beta_ref[:]
            ld0_ref[:] = ld_eta(eta_ref[:], yv)
            nev_acc[0] = 0

        eta = eta_out[:]            # (BC, n) persistent across j
        onehot = (
            lax.broadcasted_iota(jnp.int32, (d, 1), 0) == j
        ).astype(jnp.float32)       # (d, 1)
        b0 = jnp.dot(beta_out[:], onehot, preferred_element_type=jnp.float32)
        lp0 = prior_logpdf(b0)

        def g(b):
            e = eta + xj * (b - b0)
            dll = jnp.sum(ld_eta(e, yv) - ld0_ref[:], axis=1, keepdims=True)
            return dll + (prior_logpdf(b) - lp0)

        level = jnp.log(_uniform((BC, 1)))
        u = _uniform((BC, 1))
        L = b0 - w * u
        R = L + w
        uj = _uniform((BC, 1))
        J = jnp.floor(uj * max_stepouts).astype(jnp.int32)
        K = (max_stepouts - 1) - J

        def stepout(end0, budget, direction):
            # masks carried as int32: Mosaic cannot legalize i1 while carries
            def cond(c):
                return jnp.max(c[2]) > 0

            def body(c):
                end, budget, _, nev = c
                f = g(end)
                active = (f > level) & (budget > 0)
                end = _sel(active, end + direction * w, end)
                budget = _sel(active, budget - 1, budget)
                return end, budget, active.astype(jnp.int32), nev + 1

            end, _, _, nev = lax.while_loop(
                cond, body,
                (end0, budget, jnp.ones((BC, 1), jnp.int32),
                 jnp.zeros((), jnp.int32)),
            )
            return end, nev

        L, nL = stepout(L, J, jnp.float32(-1.0))
        R, nR = stepout(R, K, jnp.float32(1.0))

        def shrink_cond(c):
            return (jnp.min(c[3]) < 1) & (c[4] < max_shrink)

        def shrink_body(c):
            L, R, bnew, accepted, it = c
            acc = accepted > 0
            u = _uniform((BC, 1))
            x1 = L + (R - L) * u
            f = g(x1)
            ok = f >= level
            bnew = _sel(ok & (~acc), x1, bnew)
            rej = (~ok) & (~acc)
            L = _sel(rej & (x1 < b0), x1, L)
            R = _sel(rej & (x1 >= b0), x1, R)
            return L, R, bnew, (acc | ok).astype(jnp.int32), it + 1

        _, _, bnew, accepted, n_shrink = lax.while_loop(
            shrink_cond, shrink_body,
            (L, R, b0, jnp.zeros((BC, 1), jnp.int32), jnp.zeros((), jnp.int32)),
        )
        bnew = _sel(accepted > 0, bnew, b0)

        # commit in the persistent buffers; beta column via rank-1 one-hot add
        eta_new = eta + xj * (bnew - b0)
        eta_out[:] = eta_new
        ld0_ref[:] = ld_eta(eta_new, yv)
        beta_out[:] = beta_out[:] + (bnew - b0) * onehot.reshape(1, d)
        nev_acc[0] = nev_acc[0] + nL + nR + n_shrink

        @pl.when(j == d - 1)
        def _():
            nev_out[:] = jnp.broadcast_to(nev_acc[0], (BC, 1))

    def sweep(eta, beta, Xt3, y, seed, w):
        C, n = eta.shape
        out_shapes = (
            jax.ShapeDtypeStruct((C, n), jnp.float32),
            jax.ShapeDtypeStruct((C, d), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
        )
        eta2, beta2, nev = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # w
                pl.BlockSpec((BC, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                # X^T rows, (d, 1, n): pipeline DMAs the next row during compute
                pl.BlockSpec((1, 1, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BC, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((BC, n), jnp.float32),  # per-obs log-density cache
                pltpu.SMEM((1,), jnp.int32),       # eval counter
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            jnp.asarray([seed], jnp.int32).reshape(1),
            jnp.asarray([w], jnp.float32).reshape(1),
            eta,
            beta.astype(jnp.float32),
            y.reshape(1, n).astype(jnp.float32),
            Xt3,
        )
        return eta2, beta2, nev[:, 0]

    return sweep
