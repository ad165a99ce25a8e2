"""Diagnose the poisson/Laplace worst-coordinate ESS gap (VERDICT r2 #4).

Round-2 and round-3 TPU recordings of baseline config #3 show min-ESS/s
2.5-3x below the median, while CPU replications of the identical config
sit at 1.1-1.2x.  This script runs the config on the current backend with
a LONGER timed window and reports, per window length: the worst
coordinate's identity, its ESS, adapted width, true beta, posterior
moments and lag-1 autocorrelation — enough to separate (a) a genuinely
slow-mixing coordinate (kink of the Laplace prior, intercept coupling)
from (b) short-window ESS-estimator noise on a heavy-tailed
autocorrelation realization.

Run: python scripts/laplace_diag.py [chains] [sweeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    n, d = 10_000, 100
    X, y, beta_true = generate_glm_data("poisson", n=n, d=d, seed=0)
    opts = (
        {"spec_k": 4, "battery_impl": "auto"}
        if jax.default_backend() != "cpu" else {}
    )
    eng = FreeRunCGGibbs(X, y, "poisson",
                         mg.make_beta_prior(mg.Laplace(0, 1), d),
                         tuning={"w": 0.3}, **opts)
    st = eng.init(jax.random.key(0), C)
    done = 0
    while done < 60:
        st, _, _ = eng.warmup(st, 20)
        jax.block_until_ready(st.beta)
        done += 20
    log("warmup done")
    parts = []
    done = 0
    while done < sweeps:
        step = min(25, sweeps - done)
        st, b, _ = eng.run(st, step)
        parts.append(b)
        done += step
    jax.block_until_ready(parts)
    draws = np.concatenate([np.asarray(p) for p in parts], axis=1)
    log(f"collected {draws.shape}")
    w = np.exp(np.asarray(st.logw)).mean(0)
    for K in (100, 200, sweeps):
        e = mg.ess(draws[:, :K, :])
        j = int(np.argmin(e))
        post = draws[:, K // 3:K, :, ][:, :, j]
        ac = np.mean([np.corrcoef(post[c, :-1], post[c, 1:])[0, 1]
                      for c in range(min(C, 16))])
        log(
            f"window={K}: min/med ESS {e.min():.0f}/{np.median(e):.0f} "
            f"(ratio {float(np.median(e) / e.min()):.2f}) worst j={j} "
            f"|beta_true[j]|={abs(beta_true[j]):.4f} w[j]={w[j]:.3f} "
            f"(med w {np.median(w):.3f}) post mean/sd "
            f"{post.mean():.4f}/{post.std():.4f} lag1 {ac:.3f}"
        )
    # rank of each window's worst coordinate in the longest window
    e_full = mg.ess(draws)
    order = np.argsort(e_full)
    log(f"full-window worst five: {order[:5]} ESS {np.round(e_full[order[:5]])}")


if __name__ == "__main__":
    main()
