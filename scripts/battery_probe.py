"""Micro-benchmark: K-proposal battery evaluation variants on TPU.

The speculative freerun pass needs dll[c, k] = sum_i ld(eta[c,i] +
xg[c,i]*delta[c,k]) - ld0[c] computed with ONE read of eta and xg.
Measured (spec_probe.py): the naive (C, K, n) XLA reduce re-streams the
inputs per proposal, so pass cost grows ~linearly in K and the speculation
win collapses to ~1.17x.  Variants probed here:

  v0  single-proposal fused eval (K=1 reference cost)
  v1  (C, K, n) broadcast + reduce axis -1 (the current formulation)
  v2  (C, n, K) broadcast + reduce middle axis (K minor)
  v3  lax.scan over n-chunks accumulating (C, K) partials
  v4  Pallas kernel: grid (C/BC, n/BN), K unrolled in-register, one
      HBM read of eta and xg, (C, K) accumulator in VMEM

Run: python scripts/battery_probe.py [K]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmcglm_tpu.datagen import generate_glm_data


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_battery_pallas(y, n_pad, K, BC, BN):
    """Logistic battery: dll-style lsum (C, K) in one eta/xg read."""
    n = y.shape[0]
    ypad = np.zeros((1, n_pad), np.float32)
    ypad[0, :n] = np.asarray(y, np.float32)
    mask = np.zeros((1, n_pad), np.float32)
    mask[0, :n] = 1.0
    ypad = jnp.asarray(ypad)
    mask = jnp.asarray(mask)

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
            ld = yv * e - jnp.logaddexp(0.0, e)
            cols.append(jnp.sum(ld * mv, axis=1, keepdims=True))
        out_ref[...] += jnp.concatenate(cols, axis=1)

    def fn(eta_pad, xg_pad, deltas):
        C = eta_pad.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(C // BC, n_pad // BN),
            in_specs=[
                pl.BlockSpec((BC, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BC, K), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, K), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(eta_pad, xg_pad, deltas, ypad, mask)

    return fn


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    C, n, d = 256, 10_000, 1000
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    Xt = jnp.asarray(np.asarray(X).T)
    yj = jnp.asarray(np.asarray(y), jnp.float32)
    rng = np.random.default_rng(0)
    j = jnp.asarray(rng.integers(0, d, C), jnp.int32)
    eta = jnp.asarray(rng.normal(size=(C, n)), jnp.float32)
    deltas = jnp.asarray(0.1 * rng.normal(size=(C, K)), jnp.float32)

    def ld_sum(e):
        return jnp.sum(yj * e - jnp.logaddexp(0.0, e), axis=-1)

    @jax.jit
    def v0(eta, j, deltas):  # single proposal
        xg = jnp.take(Xt, j, axis=0)
        return ld_sum(eta + xg * deltas[:, 0][:, None])

    @jax.jit
    def v1(eta, j, deltas):  # (C, K, n)
        xg = jnp.take(Xt, j, axis=0)
        e = eta[:, None, :] + xg[:, None, :] * deltas[:, :, None]
        return jnp.sum(yj * e - jnp.logaddexp(0.0, e), axis=-1)

    @jax.jit
    def v2(eta, j, deltas):  # (C, n, K)
        xg = jnp.take(Xt, j, axis=0)
        e = eta[:, :, None] + xg[:, :, None] * deltas[:, None, :]
        return jnp.sum(yj[None, :, None] * e - jnp.logaddexp(0.0, e), axis=1)

    BN = 2000

    @jax.jit
    def v3(eta, j, deltas):  # scan over n-chunks
        xg = jnp.take(Xt, j, axis=0)
        er = eta.reshape(C, n // BN, BN)
        xr = xg.reshape(C, n // BN, BN)
        yr = yj.reshape(n // BN, BN)

        def body(acc, chunk):
            ec, xc, yc = chunk
            e = ec[:, None, :] + xc[:, None, :] * deltas[:, :, None]
            return acc + jnp.sum(yc * e - jnp.logaddexp(0.0, e), axis=-1), None

        acc0 = jnp.zeros((C, K), jnp.float32)
        acc, _ = lax.scan(
            body, acc0,
            (jnp.swapaxes(er, 0, 1), jnp.swapaxes(xr, 0, 1), yr),
        )
        return acc

    n_pad = 10240
    BC, BNp = 128, 2048
    batt = make_battery_pallas(y, n_pad, K, BC, BNp)

    @jax.jit
    def v4(eta_pad, j, deltas):
        xg = jnp.take(Xt, j, axis=0)
        xg_pad = jnp.pad(xg, ((0, 0), (0, n_pad - n)))
        return batt(eta_pad, xg_pad, deltas)

    eta_pad = jnp.pad(eta, ((0, 0), (0, n_pad - n)))

    # correctness cross-check
    r1 = np.asarray(v1(eta, j, deltas))
    for name, r in [("v2", v2(eta, j, deltas)), ("v3", v3(eta, j, deltas)),
                    ("v4", v4(eta_pad, j, deltas))]:
        err = np.max(np.abs(np.asarray(r) - r1) / (np.abs(r1) + 1))
        log(f"{name} rel err vs v1: {err:.2e}")

    for name, fn, args in [
        ("v0 K=1 fused  ", v0, (eta, j, deltas)),
        ("v1 (C,K,n)    ", v1, (eta, j, deltas)),
        ("v2 (C,n,K)    ", v2, (eta, j, deltas)),
        ("v3 scan-chunk ", v3, (eta, j, deltas)),
        ("v4 pallas     ", v4, (eta_pad, j, deltas)),
    ]:
        t = timeit(fn, *args)
        log(f"{name}: {t*1e6:8.1f} us  ({t/ (2*C*n*4/819e9):5.1f}x 2-stream roofline)")


if __name__ == "__main__":
    main()
