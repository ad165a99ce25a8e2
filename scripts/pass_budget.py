"""Pass-time budget: decompose the freerun device pass into named parts.

VERDICT r3 #5 found the classic pass at 45% of the 3-stream HBM roofline
with no artifact naming the other 55%.  This script times, on the
north-star config (p=1000 logistic, n=10k, C=256):

  A. full pass            — _run_pass_block, exactly P automaton passes
  B. bare battery kernel  — the pallas3/pallas2 kernel alone, chained
                            eta->eta so every call really streams HBM
  C. hbm floor            — a pure 3-stream op of the same footprint
                            (read 2x (C, n_pad) f32 + write one): the
                            achievable-bandwidth ceiling for this shape
  D. scatter bookkeeping  — the per-pass (C, d) scatters (beta commit,
                            draws drop-scatter, nevbuf) in isolation
  E. prior battery        — coord_log_prob over the (C, K) proposals
  F. proposal gen         — the K-step shrink interval recursion (C, K)

A - B = automaton + scatter + proposal + prior + dispatch overhead; D-F
name that remainder.  Each block is timed over `reps` chained calls of a
P-iteration executable, so per-dispatch tunnel noise amortises away.

Variants accept an optional storage tag: `4:pallas3:bf16` measures the
halved X-row stream (x_storage="bf16").

Usage: python scripts/pass_budget.py [C] [variants...]
       default C=256, variants 4:pallas3 4:pallas3:bf16 4:pallas2 1:xla
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs

HBM_PEAK_GBPS = 819.0  # v5e


def log(m):
    print(time.strftime("%H:%M:%S"), m, flush=True)


def time_us(fn, arg, P, reps=3):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * P) * 1e6


def main():
    args = sys.argv[1:]
    C = int(args[0]) if args and ":" not in args[0] else 256
    variants = [a for a in args if ":" in a] or [
        "4:pallas3", "4:pallas3:bf16", "4:pallas2", "1:xla"
    ]
    n = int(os.environ.get("PB_N", 10_000))
    d = int(os.environ.get("PB_D", 1000))
    P = int(os.environ.get("PB_PASSES", 2000))
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)

    for spec in variants:
        parts = spec.split(":")
        K, impl = int(parts[0]), parts[1]
        storage, bc3 = "f32", None
        for tok in parts[2:]:
            if tok == "bf16":
                storage = "bf16"
            elif tok.startswith("bc"):
                bc3 = int(tok[2:])
        tag = f"K={K} {impl}" + ("/bf16" if storage == "bf16" else "") + (
            f"/bc{bc3}" if bc3 else "")
        log(f"building {tag}")
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=K, battery_impl=impl,
            x_storage=storage,
        )
        if bc3:
            eng._bc3 = bc3
        state = eng.init(jax.random.key(0), C)
        state, _, _ = eng.warmup(state, 5)
        jax.block_until_ready(state.beta)
        n_pad = int(np.prod(eng.Xt.shape[1:]))

        # A. full pass
        fn = jax.jit(partial(
            eng._run_pass_block, n_sweeps=1 << 30, n_passes=P,
            adapt=False, shrink_only=True,
        ))
        sc = jnp.zeros((C,), jnp.int32)
        a_us = time_us(lambda s: fn(s, sc)[0].beta, state, P)
        x_bytes = (2 if storage == "bf16" else 4) * C * n_pad
        a_gbps = (2 * 4 * C * n_pad + x_bytes) / (a_us / 1e6) / 1e9
        log(f"{tag}  A full pass      : {a_us:7.1f} us "
            f"({a_gbps:5.1f} GB/s eff. on its stream model)")

        # B. bare battery kernel, eta-chained
        if impl in ("pallas2", "pallas3"):
            dt = jnp.float32
            deltas = 0.01 * jax.random.normal(jax.random.key(1), (C, K), dt)
            fprior = jnp.zeros((C, K), dt)
            scal = jnp.stack([
                -jnp.ones((C,), dt), jnp.zeros((C,), dt),
                jnp.ones((C,), dt), jnp.full((C,), 64.0, dt)], axis=1)
            jidx = jnp.arange(C, dtype=jnp.int32) % d
            if impl == "pallas3":
                bat = eng._battery3_fn(C)

                def chain3(eta0):
                    def body(_, eta):
                        _, eta_new = bat(jidx, eta, deltas, fprior, scal)
                        return eta_new
                    return lax.fori_loop(0, P, body, eta0)

                b_us = time_us(jax.jit(chain3), state.eta, P)
            else:
                bat = eng._battery2_fn(C)
                xg = jnp.take(eng.Xt, jidx, axis=0)

                def chain2(eta0):
                    def body(_, eta):
                        _, eta_new = bat(eta, xg, deltas, fprior, scal)
                        return eta_new
                    return lax.fori_loop(0, P, body, eta0)

                b_us = time_us(jax.jit(chain2), state.eta.reshape(C, n_pad)
                               if state.eta.ndim == 3 else state.eta, P)
            b_gbps = (2 * 4 * C * n_pad + x_bytes) / (b_us / 1e6) / 1e9
            log(f"{tag}  B bare kernel    : {b_us:7.1f} us "
                f"({b_gbps:5.1f} GB/s; A-B = {a_us - b_us:.1f} us "
                "automaton+prior+scatter+dispatch)")

        # C. pure 3-stream HBM floor at this footprint (read 2, write 1).
        # The multiply-accumulate recurrence cannot be strength-reduced
        # by XLA (a plain acc + c*x2 loop WAS collapsed to acc + P*c*x2,
        # reporting a fake 4 TB/s in the first version of this probe).
        e2 = jnp.zeros((C, n_pad), jnp.float32)
        x2 = jnp.ones((C, n_pad), jnp.float32)

        def hbm(e):
            def body(_, acc):
                return acc * 0.999 + x2
            return lax.fori_loop(0, P, body, e)

        c_us = time_us(jax.jit(hbm), e2, P)
        c_gbps = 3 * 4 * C * n_pad / (c_us / 1e6) / 1e9
        log(f"{tag}  C 3-stream floor : {c_us:7.1f} us "
            f"({c_gbps:5.1f} GB/s = {100 * c_gbps / HBM_PEAK_GBPS:.0f}% "
            "of 819 peak)")

        # D. the per-pass scatters, split: D1 the (C,) beta commit,
        # D2 the draws+nevbuf drop-scatters (candidates for cond-gating:
        # they only DO anything on sweep-completion passes)
        rows = jnp.arange(C)
        draws0 = jnp.zeros((C, 1, d), jnp.float32)

        def beta_scatter(beta0):
            def body(i, beta):
                jj = (rows + i) % d
                return beta.at[rows, jj].set(beta[:, 0] + 1e-6)
            return lax.fori_loop(0, P, body, beta0)

        d1_us = time_us(jax.jit(beta_scatter), state.beta, P)

        def draw_scatter(beta0):
            def body(i, carry):
                draws, nev = carry
                slot = jnp.where(rows + i < 0, 0, 1)  # all OOB -> dropped
                draws = draws.at[rows, slot].set(beta0, mode="drop")
                nev = nev.at[rows, slot].set(i, mode="drop")
                return draws, nev
            return lax.fori_loop(
                0, P, body, (draws0, jnp.zeros((C, 1), jnp.int32))
            )[0]

        d2_us = time_us(jax.jit(draw_scatter), state.beta, P)
        log(f"{tag}  D scatters       : beta {d1_us:6.1f} us, "
            f"draws+nev {d2_us:6.1f} us")

        # G. per-pass RNG (split + the four batched draws)
        def rng(key0):
            def body(_, key):
                key, k_u, k_a, k_b, k_c = jax.random.split(key, 5)
                u = jax.random.uniform(k_u, (C, K), dtype=jnp.float32)
                lv = jax.random.exponential(k_a, (C,), dtype=jnp.float32)
                ua = jax.random.uniform(k_b, (C,), dtype=jnp.float32)
                ub = jax.random.uniform(k_c, (C,), dtype=jnp.float32)
                return jax.random.fold_in(key, (u[0, 0] + lv[0] + ua[0]
                                                + ub[0] > 0).astype(int))
            return lax.fori_loop(0, P, body, key0)

        g_us = time_us(jax.jit(rng), jax.random.key(0), P)
        log(f"{tag}  G per-pass RNG   : {g_us:7.1f} us")

        # E. prior battery  F. proposal recursion
        xs0 = jnp.zeros((C, K), jnp.float32)

        def prior_bat(beta0):
            def body(i, acc):
                lp = eng._coord_lp_k(beta0, jidx, acc)
                return acc + 1e-9 * lp
            return lax.fori_loop(0, P, body, xs0)

        e_us = time_us(jax.jit(prior_bat), state.beta, P)

        def prop_gen(u0):
            def body(i, carry):
                L, R = carry
                Lc, Rc = L, R
                b0 = 0.5 * (L + R)
                for k in range(K):
                    x = Lc + (Rc - Lc) * u0[:, k]
                    Lc = jnp.where(x < b0, x, Lc)
                    Rc = jnp.where(x >= b0, x, Rc)
                return Lc, Rc
            out = lax.fori_loop(
                0, P, body,
                (jnp.zeros((C,), jnp.float32), jnp.ones((C,), jnp.float32)),
            )
            return out[0]

        f_us = time_us(jax.jit(prop_gen),
                       jax.random.uniform(jax.random.key(2), (C, K)), P)
        log(f"{tag}  E prior battery  : {e_us:7.1f} us   "
            f"F proposal gen: {f_us:7.1f} us")


if __name__ == "__main__":
    main()
