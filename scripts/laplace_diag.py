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
    # FORCE_SPEC=1 runs the speculative scalar-cache configuration on CPU
    # too (xla battery) — the backend-parity discriminator
    if jax.default_backend() != "cpu":
        opts = {"spec_k": 4, "battery_impl": "auto"}
    elif os.environ.get("FORCE_SPEC"):
        opts = {"spec_k": 4, "battery_impl": "xla", "eval_cache": "scalar"}
    else:
        opts = {}
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
    # direct test of the frozen-eta-offset mechanism: the committed eta
    # minus X @ beta, per chain.  Incremental updates preserve any init
    # error forever; a nonzero per-chain MEAN of this residual is
    # indistinguishable from a per-chain intercept shift.
    eta2 = np.asarray(st.eta, np.float64).reshape(C, -1)[:, :n]
    resid = eta2 - np.asarray(st.beta, np.float64) @ X.T
    m = resid.mean(axis=1)
    log(f"eta - X@beta per-chain mean: sd {m.std():.2e}, "
        f"max |mean| {np.abs(m).max():.2e}, elementwise max "
        f"{np.abs(resid).max():.2e}")

    # rank of each window's worst coordinate in the longest window
    e_full = mg.ess(draws)
    order = np.argsort(e_full)
    log(f"full-window worst five: {order[:5]} ESS {np.round(e_full[order[:5]])}")

    # per-chain structure of the worst coordinate vs a healthy one
    wlog = np.exp(np.asarray(st.logw))
    for j, tag in ((int(order[0]), "worst"), (int(order[d // 2]), "median")):
        x = draws[:, :, j]  # (C, K)
        means = x.mean(1)
        sds = x.std(1)
        half = x.shape[1] // 2
        drift = x[:, half:].mean(1) - x[:, :half].mean(1)
        wj = wlog[:, j]
        log(
            f"[{tag} j={j}] chain-mean sd {means.std():.5f} vs expected "
            f"{float(np.median(sds)) / np.sqrt(max(e_full[j] / C, 1)):.5f} "
            f"(within-sd med {np.median(sds):.5f}); "
            f"half-drift |mean|/max {np.abs(drift).mean():.5f}/"
            f"{np.abs(drift).max():.5f}; "
            f"w_j quantiles {np.round(np.quantile(wj, [0, .25, .5, .75, 1]), 4)}"
        )
        # do small-w chains have offset means? correlation across chains
        if means.std() > 0 and wj.std() > 0:
            log(f"[{tag} j={j}] corr(|chain mean - grand|, w_j) = "
                f"{np.corrcoef(np.abs(means - means.mean()), wj)[0, 1]:.3f}")


if __name__ == "__main__":
    main()
