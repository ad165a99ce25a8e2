"""Roofline probe for the FreeRunCGGibbs pass on the north-star config.

Times (a) the full sampling executable per-pass, (b) the isolated fused
evaluation (gather + axpy + log-density + reduce), and (c) a pure
HBM-stream op of the same footprint, to attribute pass time between
memory bandwidth, transcendentals, and automaton overhead.

Usage: python scripts/profile_pass.py [C]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n, d = 10_000, 1000
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    eng = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d), tuning={"w": 0.5}
    )
    state = eng.init(jax.random.key(0), C)
    state, _, _ = eng.warmup(state, 5)
    jax.block_until_ready(state.beta)

    # (a) full run: passes/sec from the automaton loop
    nev0 = np.asarray(state.nev).copy()
    sweeps = 8
    t0 = time.perf_counter()
    state2, draws, nev = eng.run(state, sweeps)
    jax.block_until_ready(draws)
    # re-run now that it's compiled
    t0 = time.perf_counter()
    state2, draws, nev = eng.run(state, sweeps)
    jax.block_until_ready(draws)
    run_s = time.perf_counter() - t0
    # passes executed = max evals any lane needed (the while loop trip count)
    # approximate with mean evals + tail
    evals = (np.asarray(state2.nev) - nev0) / 1.0
    mean_evals = float(np.mean(evals))
    # trip count is identical across lanes (single while loop): use max
    trips = float(np.max(evals))
    per_pass = run_s / trips
    print(f"C={C}: run {run_s*1e3:.1f} ms, ~{trips:.0f} passes, "
          f"{per_pass*1e6:.1f} us/pass, mean evals/lane {mean_evals:.0f}")

    # (b) isolated fused evaluation at the same shapes
    Xt = eng.Xt
    eta = state.eta
    ld0 = state.ld0
    j = state.j
    xprop = state.xprop
    b0 = state.b0

    @jax.jit
    def fused_eval(eta, ld0, j, xprop, b0):
        xg = jnp.take(Xt, j, axis=0)
        e = eta + xg * (xprop - b0)[:, None]
        ld_e = eng.family.log_density_eta(e, eng.y, eng.extra)
        f = jnp.sum(ld_e - ld0, axis=-1)
        return e, ld_e, f

    t = timeit(fused_eval, eta, ld0, j, xprop, b0)
    print(f"fused eval (materialise e, ld_e): {t*1e6:.1f} us")

    @jax.jit
    def fused_eval_scalar(eta, j, xprop, b0, ll0):
        xg = jnp.take(Xt, j, axis=0)
        e = eta + xg * (xprop - b0)[:, None]
        ld_e = eng.family.log_density_eta(e, eng.y, eng.extra)
        return jnp.sum(ld_e, axis=-1) - ll0

    ll0 = jnp.sum(ld0, axis=-1)
    t = timeit(fused_eval_scalar, eta, j, xprop, b0, ll0)
    print(f"fused eval (scalar ll0, f only):  {t*1e6:.1f} us")

    # (c) pure streaming ops of matching footprint
    @jax.jit
    def stream_rw(eta):
        return eta * 1.0001 + 1.0

    t = timeit(stream_rw, eta)
    print(f"stream read+write (C,n):          {t*1e6:.1f} us")

    @jax.jit
    def gather_only(j):
        return jnp.sum(jnp.take(Xt, j, axis=0), axis=-1)

    t = timeit(gather_only, j)
    print(f"gather+reduce only:               {t*1e6:.1f} us")

    @jax.jit
    def transcend(eta):
        return jnp.sum(jnp.logaddexp(0.0, eta), axis=-1)

    t = timeit(transcend, eta)
    print(f"softplus+reduce (C,n):            {t*1e6:.1f} us")

    mb = C * n * 4 / 1e6
    print(f"(C,n) array = {mb:.1f} MB; pass traffic w/ ld0 cache ~{5*mb:.0f} MB, "
          f"scalar-ll0 ~{3*mb:.0f} MB")


if __name__ == "__main__":
    main()
