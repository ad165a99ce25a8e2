"""Run the BASELINE.json config matrix and emit one JSON line per config.

Configs (BASELINE.md):
  1. gaussian n=1000 p=3 (README example) — correctness anchor
  2. logistic n=10k p=100, normal prior
  3. poisson/log n=10k p=100, Laplace (sparse) prior
  4. gaussian p=10k linear-runtime stress (reduced sweep count)
  5. 4096 parallel chains of p=1000 logistic with pooled R-hat/ESS

Run on TPU:  python scripts/baseline_configs.py
CPU (small): env PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/baseline_configs.py --small
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.parallel.pooled import ChainMoments, pooled_summary


def run_config(name, family, n, d, prior, w, n_chains, burnin, timed, extra=None):
    """Freerun engine (the production configuration): adaptive-width warmup
    over the burn-in, then frozen-width shrink-only sampling."""
    X, y, beta_true = generate_glm_data(
        family if family != "gaussian-readme" else "gaussian", n=n, d=d, seed=0
    )
    fam = "gaussian" if family.startswith("gaussian") else family
    from mcmcglm_tpu.freerun import FreeRunCGGibbs

    eng = FreeRunCGGibbs(X, y, fam, mg.make_beta_prior(prior, d),
                         extra=extra or {}, tuning={"w": w})
    state = eng.init(jax.random.key(0), n_chains)
    t0 = time.perf_counter()
    state, _, _ = eng.warmup(state, burnin)  # adapt + burn in, one executable
    jax.block_until_ready(state.beta)
    compile_s = time.perf_counter() - t0

    # chunked dispatches: long executions can exceed remote-runtime deadlines
    chunk = max(1, min(30, 7680 // n_chains))  # keep each dispatch under ~60s
    state, b, _ = eng.run(state, chunk)  # compile the sampling executable
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    parts = []
    done = 0
    while done < timed:
        step = min(chunk, timed - done)
        state, betas, _ = eng.run(state, step)
        parts.append(betas)  # stays on device during the timed section
        done += step
    jax.block_until_ready(parts)
    dt = time.perf_counter() - t0
    draws = np.concatenate([np.asarray(p) for p in parts], axis=1)
    ess = mg.ess(draws)
    rhat = mg.split_rhat(draws)
    err = np.abs(draws.reshape(-1, d).mean(0) - beta_true)
    out = {
        "config": name,
        "family": fam,
        "n": n,
        "d": d,
        "chains": n_chains,
        "timed_sweeps": timed,
        "seconds": round(dt, 2),
        "compile_s": round(compile_s, 1),
        "min_ess_per_s": round(float(np.min(ess)) / dt, 2),
        "median_ess_per_s": round(float(np.median(ess)) / dt, 2),
        "max_rhat": round(float(np.max(rhat)), 4),
        "max_abs_mean_err": round(float(err.max()), 4),
    }
    print(json.dumps(out), flush=True)
    return out


def run_pooled_4096(n, d, n_chains, burnin, timed):
    """Config #5: massive chain count with streaming pooled diagnostics."""
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    eng = mg.CGGibbs(X, y, "binomial", mg.IIDPrior(mg.Normal(0, 1), d),
                     tuning={"w": 0.5})
    state = eng.init(jax.random.key(0), n_chains)
    t0 = time.perf_counter()
    state, b, _ = eng.run(state, 1)
    jax.block_until_ready(b)
    compile_s = time.perf_counter() - t0
    chunk = max(1, min(30, 7680 // n_chains))
    done = 0
    while done < burnin:
        step = min(chunk, burnin - done)
        state, b, _ = eng.run(state, step)
        jax.block_until_ready(b)
        done += step
    t0 = time.perf_counter()
    mom = None
    dparts = []
    done = 0
    while done < timed:
        step = min(max(chunk // 2, 1), timed - done)  # x2 sweeps per outer step
        state, mom, draws, _ = eng.run_thinned(state, n_outer=step, thin=2, moments=mom)
        dparts.append(np.asarray(draws))
        done += step
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    draws = np.concatenate(dparts, axis=1)
    summ = pooled_summary(ChainMoments(mom.count[0], mom.mean, mom.m2))
    ess = mg.ess(np.asarray(draws))
    out = {
        "config": "pod_4096_chains_p%d_logistic" % d,
        "chains": n_chains,
        "sweeps": timed * 2,
        "seconds": round(dt, 2),
        "compile_s": round(compile_s, 1),
        "chain_sweeps_per_s": round(n_chains * timed * 2 / dt, 1),
        "pooled_max_rhat": round(float(np.max(np.asarray(summ["rhat"]))), 4),
        "min_ess_per_s_thinned": round(float(np.min(ess)) / dt, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip-pod", action="store_true",
                    help="skip the long 4096-chain pooled config")
    args = ap.parse_args()
    s = args.small

    run_config("readme_gaussian_n1000_p3", "gaussian", 1000, 3,
               mg.Normal(0, 1), 0.5, 8 if s else 64, 100, 400,
               extra={"sd": 1.0})
    run_config("logistic_n10k_p100_normal", "binomial",
               2000 if s else 10_000, 100, mg.Normal(0, 1), 0.5,
               8 if s else 64, 60, 100)
    run_config("poisson_n10k_p100_laplace", "poisson",
               2000 if s else 10_000, 100, mg.Laplace(0, 1), 0.3,
               8 if s else 64, 60, 100)
    run_config("gaussian_p10k_stress", "gaussian",
               1000 if s else 2000, 1000 if s else 10_000,
               mg.Normal(0, 1), 0.5, 8, 5, 10, extra={"sd": 1.0})
    if not args.skip_pod:
        run_pooled_4096(2000 if s else 10_000, 100 if s else 1000,
                        64 if s else 4096, 20 if s else 30, 25 if s else 30)


if __name__ == "__main__":
    main()
