"""Roofline: exact per-pass time for each battery implementation.

Uses FreeRunCGGibbs._run_pass_block with a fixed pass budget (and an
unreachable sweep quota), so the measured executable runs EXACTLY P
automaton passes — no trip-count inference from eval counters.  For each
implementation the achieved HBM bandwidth is derived from its stream
model and compared to the chip's peak:

  impl     (C, n) f32 streams / pass
  xla K=1  3   read eta, read gathered X^T rows (fused), write eta
           (+2 when eval_cache='per_obs')
  xla K>1  ~2 + 2K  (eta + X rows re-streamed per proposal by XLA)
  pallas   ~6  gather rd+wr, kernel rd eta+xg, commit rd eta+xg wr eta
  pallas2  ~5  gather rd+wr, kernel rd eta+xg, kernel wr eta
  pallas3  ~3  kernel rd eta, kernel rd X rows (in-kernel gather), wr eta

TPU v5e HBM peak: ~819 GB/s.

Usage: python scripts/roofline_battery.py [C] [variants...]
       e.g. python scripts/roofline_battery.py 256 1:xla 4:pallas2 4:pallas3
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs

HBM_PEAK_GBPS = {"tpu": 819.0}  # v5e


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def streams(impl: str, K: int) -> float:
    if K == 1:
        return 3.0
    return {"xla": 2.0 + 2.0 * K, "pallas": 6.0, "pallas2": 5.0,
            "pallas3": 3.0}[impl]


def main():
    args = sys.argv[1:]
    C = int(args[0]) if args and ":" not in args[0] else 256
    variants = [a for a in args if ":" in a] or [
        "1:xla", "4:xla", "4:pallas", "4:pallas2", "4:pallas3"
    ]
    n, d = 10_000, 1000
    P = 2000  # passes per timed block
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    peak = HBM_PEAK_GBPS.get(jax.default_backend())
    for spec in variants:
        k_s, impl = spec.split(":")
        K = int(k_s)
        log(f"building K={K} impl={impl}")
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=K, battery_impl=impl,
        )
        state = eng.init(jax.random.key(0), C)
        state, _, _ = eng.warmup(state, 5)  # realistic registers/widths
        jax.block_until_ready(state.beta)
        fn = jax.jit(partial(
            eng._run_pass_block, n_sweeps=1 << 30, n_passes=P,
            adapt=False, shrink_only=True,
        ))
        sc = jnp.zeros((C,), jnp.int32)
        st2, _ = fn(state, sc)  # compile
        jax.block_until_ready(st2.beta)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            st2, _ = fn(state, sc)
        jax.block_until_ready(st2.beta)
        us = (time.perf_counter() - t0) / (reps * P) * 1e6
        n_pad = int(np.prod(eng.Xt.shape[1:])) if eng.Xt.ndim == 2 else n
        sm = streams(impl, K)
        bytes_per_pass = sm * C * n_pad * 4
        gbps = bytes_per_pass / (us / 1e6) / 1e9
        line = (f"K={K} {impl:8s}: {us:7.1f} us/pass "
                f"({sm:.0f} streams -> {gbps:6.1f} GB/s")
        if peak:
            line += f", {100 * gbps / peak:5.1f}% of HBM peak"
        log(line + ")")


if __name__ == "__main__":
    main()
