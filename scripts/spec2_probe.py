"""Probe: freerun throughput across battery implementations on the
north-star config (p=1000 logistic, C=256, warm, adapted widths).

Args are VARIANT specs "K", "K:impl" or "K:impl:adapt_c"
(impl in xla|pallas|pallas2|pallas3), e.g.:
  python scripts/spec2_probe.py 1 4:pallas3 4:pallas3:80
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.diagnostics import ess
from mcmcglm_tpu.freerun import FreeRunCGGibbs


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def main():
    specs = sys.argv[1:] or ["1", "4:pallas", "4:pallas2", "6:pallas2"]
    n, d, C = 10_000, 1000, 256
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    for spec in specs:
        parts_s = spec.split(":")
        k_s = parts_s[0]
        impl = parts_s[1] if len(parts_s) > 1 else "xla"
        adapt_c = float(parts_s[2]) if len(parts_s) > 2 else 40.0
        K = int(k_s)
        log(f"building K={K} impl={impl} adapt_c={adapt_c}")
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=K, battery_impl=impl if K > 1 else "xla",
            adapt_c=adapt_c,
        )
        state = eng.init(jax.random.key(0), C)
        for _ in range(2):  # chunked warmup
            state, _, _ = eng.warmup(state, 15)
            jax.block_until_ready(state.beta)
        state, _, _ = eng.run(state, 10)  # compile sampling executable
        jax.block_until_ready(state.beta)
        nev0 = np.asarray(state.nev).copy()
        sweeps, chunk = 60, 20
        t0 = time.perf_counter()
        parts = []
        done = 0
        while done < sweeps:
            state, draws, nev = eng.run(state, chunk)
            parts.append(draws)
            done += chunk
        jax.block_until_ready(parts)
        dt = time.perf_counter() - t0
        alld = np.concatenate([np.asarray(p) for p in parts], axis=1)
        evals = float(np.mean(np.asarray(state.nev) - nev0))
        min_ess = float(np.min(ess(alld)))
        log(
            f"K={K} {impl:8s} c={adapt_c:<5.0f}: {sweeps/dt:7.3f} sweeps/s, "
            f"evals/coord={evals/sweeps/d:.2f}, "
            f"min-ESS/s={min_ess/dt:7.1f}, "
            f"C*sweeps/s={C*sweeps/dt:9.1f}"
        )


if __name__ == "__main__":
    main()
