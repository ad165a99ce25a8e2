"""Diagnose the round-4 pod anomaly: pooled R-hat 7.5 on some coordinate
at C=4096 (chains healthy at C=256 on the same problem).

Protocol: run the exact pod configuration twice — once with the round-4
two-phase warmup (quota 6), once with the full stepping-out schedule
(quota = all sweeps, the r3 behavior) — at reduced timed length, then for
each: find the worst pooled-R-hat coordinate and print its forensic
signature (per-chain mean scatter, within-chain variance, frozen-chain
count, the adapted width distribution for that coordinate).

Run: /opt/venv/bin/python scripts/pod_diag.py [C] [quota ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.parallel.freerun_sharded import ShardedFreeRunCGGibbs
from mcmcglm_tpu.parallel.pooled import pooled_summary


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def run_one(X, y, C, quota, burnin=30, timed=40):
    eng = ShardedFreeRunCGGibbs(
        X, y, "binomial", mg.make_beta_prior(mg.Normal(0, 1), X.shape[1]),
        tuning={"w": 0.5}, spec_k=4, battery_impl="auto",
    )
    state = eng.init(jax.random.key(0), C)
    sc = None
    while True:
        state, sc = eng.warmup_passes(state, sc, burnin, 1500,
                                      stepout_sweeps=quota)
        jax.block_until_ready(state.beta)
        scn = np.asarray(sc)
        log(f"quota={quota}: warmup min {scn.min()} / quota {burnin}")
        if (scn >= burnin).all():
            break
    logw = np.asarray(state.logw)
    mom, dparts, done = None, [], 0
    while done < timed:  # chunked: one big dispatch trips the RPC deadline
        step = min(8, timed - done)
        state, mom, dr, _ = eng.run_thinned(state, n_outer=step, thin=1,
                                            moments=mom)
        jax.block_until_ready(dr)
        done += step
        log(f"quota={quota}: timed {done}/{timed}")
        dparts.append(np.asarray(dr))
    draws = np.concatenate(dparts, axis=1)  # (C, timed, d)
    summ = jax.jit(pooled_summary)(mom)
    rhat = np.asarray(summ["rhat"])
    jworst = int(np.argmax(rhat))
    col = draws[:, :, jworst]  # (C, timed)
    within_sd = col.std(axis=1)
    frozen = int((within_sd < 1e-7).sum())
    log(
        f"quota={quota}: max pooled rhat {rhat.max():.3f} at j={jworst}; "
        f"rhat>1.1 count {(rhat > 1.1).sum()}"
    )
    log(
        f"  j={jworst}: chain-mean sd {col.mean(1).std():.5f}, "
        f"median within-chain sd {np.median(within_sd):.5f}, "
        f"frozen chains (within-sd<1e-7): {frozen}/{C}"
    )
    lw = logw[:, jworst]
    log(
        f"  adapted log-width j={jworst}: min {lw.min():.2f} "
        f"median {np.median(lw):.2f} max {lw.max():.2f}"
    )
    # overall width health
    log(
        f"  all-coordinate logw: min {logw.min():.2f} "
        f"p1 {np.percentile(logw, 1):.2f} median {np.median(logw):.2f} "
        f"max {logw.max():.2f}"
    )
    nev = np.asarray(state.nev)
    log(f"  evals/chain-sweep mean {nev.mean() / (burnin + timed):.1f}")
    return rhat, logw


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    quotas = [int(q) for q in sys.argv[2:]] or [6, 30]
    n, d = 10_000, 1000
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    for q in quotas:
        run_one(X, y, C, q)


if __name__ == "__main__":
    main()
