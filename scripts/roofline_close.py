"""Round-5 roofline close-out (VERDICT r4 #4): bound the last gap between
the measured freerun pass and the 3-stream HBM speed of light.

Three same-process timings at the north-star shapes (C=256, n=10k padded,
d=1000, K=4):

  t_triad   — a bare 3-stream XLA kernel (c = a + b) on the exact
              (C, n_pad) f32 operands: the achievable-stream floor on
              THIS chip in THIS tunnel window (not the paper 819 GB/s).
  t_battery — the selected Pallas battery called alone on fixed operands
              (the pass's (C, n)-traffic component).
  t_pass    — one full automaton pass (run_passes-bounded, all lanes
              active): battery + RNG + gather index + commits +
              bookkeeping.

gap(kernel)    = t_battery / t_triad  — kernel inefficiency vs pure
                 streams (DMA latency, tiling, in-kernel compute).
gap(automaton) = t_pass - t_battery   — everything outside the kernel.

Appends a JSON record to results/round5_roofline.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def _time(fn, *args, reps=4, block=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out if block is None else block(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out if block is None else block(out))
        times.append(time.perf_counter() - t0)
    return min(times), times


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.datagen import generate_glm_data
    from mcmcglm_tpu.freerun import FreeRunCGGibbs

    on_accel = jax.default_backend() != "cpu"
    n, d, C = (10_000, 1000, 256) if on_accel else (2000, 100, 8)
    battery = os.environ.get("ROOFLINE_BATTERY",
                             "pallas3" if on_accel else "xla")

    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    eng = FreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        tuning={"w": 0.5}, spec_k=4,
        battery_impl=battery if on_accel else "pallas2",  # CPU: interpret
    )
    state = eng.init(jax.random.key(0), C)
    state, _, _ = eng.warmup(state, 10)
    jax.block_until_ready(state.beta)
    n_pad = int(np.prod(eng.Xt.shape[1:]))
    print(f"# engine ready: battery={eng.battery_impl} n_pad={n_pad}",
          file=sys.stderr, flush=True)

    # -- 1. bare 3-stream floor at the pass's shapes ----------------------
    # REPS back-to-back triads per dispatch so per-dispatch latency
    # (tunnel RPC ~ms here) cannot masquerade as kernel time
    # operands sized PAST VMEM (3 x 168 MB at the TPU shapes): a small
    # (C, n_pad) triad goes VMEM-resident across the scan (measured 1447
    # "GB/s" — above the HBM peak) and stops being an HBM floor
    TR = 300
    CB = 4096 if on_accel else C
    a = jnp.ones((CB, n_pad), jnp.float32)
    b = jnp.full((CB, n_pad), 2.0, jnp.float32)

    @jax.jit
    def triads(a, b):
        def step(c, _):
            # single fused elementwise kernel: read a, read b, write c
            # (the c[0,0]*1e-20 term keeps the loop-carried dependence
            # without growing the values, so XLA cannot hoist the body)
            return a + b * (c[0, 0] * 1e-20 + 1.0), None
        c, _ = jax.lax.scan(step, b, None, length=TR)
        return c

    t_triad, triad_reps = _time(triads, a, b)
    t_triad /= TR
    gbps_triad = 3 * CB * n_pad * 4 / t_triad / 1e9
    # the pass-shaped equivalent floor time at that bandwidth
    t_floor = 3 * C * n_pad * 4 / (gbps_triad * 1e9)

    # -- 2. the battery kernel alone --------------------------------------
    P = 1500
    if eng.battery_impl == "pallas3":
        fn3 = eng._battery3_fn(C)
        S, L = eng._eta3
        eta3 = jnp.zeros((C, S, L), jnp.float32)
        # random coordinate per chain: the real pass's gather pattern
        # (identical rows would alias in the HBM row buffers)
        jidx = jax.random.randint(jax.random.key(1), (C,), 0, d, jnp.int32)
        deltas = jnp.full((C, 4), 0.01, jnp.float32)
        fprior = jnp.zeros((C, 4), jnp.float32)
        scal = jnp.stack([
            jnp.full((C,), -1.0), jnp.zeros((C,)),
            jnp.ones((C,)), jnp.full((C,), 4.0)], axis=1
        ).astype(jnp.float32)

        @jax.jit
        def bat(eta3, jidx, deltas, fprior, scal):
            def step(e, _):
                ls, e2 = fn3(jidx, e, deltas, fprior, scal)
                return e2, ls
            e, ls = jax.lax.scan(step, eta3, None, length=P)
            return e, ls

        t_bat, bat_reps = _time(bat, eta3, jidx, deltas, fprior, scal,
                                block=lambda o: o[0])
        t_bat /= P
        streams = 3
    else:
        fn2 = eng._battery2_fn(C) if eng.battery_impl == "pallas2" else None
        eta = jnp.zeros((C, n_pad), jnp.float32)
        xg = jnp.ones((C, n_pad), jnp.float32)
        deltas = jnp.full((C, 4), 0.01, jnp.float32)
        fprior = jnp.zeros((C, 4), jnp.float32)
        scal = jnp.stack([
            jnp.full((C,), -1.0), jnp.zeros((C,)),
            jnp.ones((C,)), jnp.full((C,), 4.0)], axis=1
        ).astype(jnp.float32)

        @jax.jit
        def bat(eta, xg, deltas, fprior, scal):
            def step(e, _):
                ls, e2 = fn2(e, xg, deltas, fprior, scal)
                return e2, ls
            e, ls = jax.lax.scan(step, eta, None, length=P)
            return e, ls

        t_bat, bat_reps = _time(bat, eta, xg, deltas, fprior, scal,
                                block=lambda o: o[0])
        t_bat /= P
        streams = 4  # + the XLA gather outside the kernel
    gbps_bat = streams * C * n_pad * 4 / t_bat / 1e9

    # -- 3. the full pass -------------------------------------------------
    PP = 1500 if on_accel else 20
    pass_fn = jax.jit(partial(
        eng._run_pass_block, n_sweeps=1 << 30, n_passes=PP,
        adapt=False, shrink_only=True,
    ))
    sc0 = jnp.zeros((C,), jnp.int32)
    t_pass, pass_reps = _time(pass_fn, state, sc0, reps=3,
                              block=lambda o: o[0].beta)
    t_pass /= PP
    gbps_pass = streams * C * n_pad * 4 / t_pass / 1e9

    rec = {
        "battery": eng.battery_impl, "C": C, "n_pad": n_pad, "d": d,
        "K": eng.spec_k,
        "t_triad_us": round(t_triad * 1e6, 2),
        "triad_gbps": round(gbps_triad, 1),
        "t_floor_us_at_pass_shapes": round(t_floor * 1e6, 2),
        "t_battery_us": round(t_bat * 1e6, 2),
        "battery_gbps": round(gbps_bat, 1),
        "t_pass_us": round(t_pass * 1e6, 2),
        "pass_gbps": round(gbps_pass, 1),
        "kernel_vs_stream_floor": round(t_bat / t_triad, 3),
        "automaton_overhead_us": round((t_pass - t_bat) * 1e6, 2),
        "pass_pct_of_stream_floor": round(100 * t_floor / t_pass, 1),
        "pass_pct_of_kernel": round(100 * t_bat / t_pass, 1),
        "rep_seconds": {
            "triad": [round(t, 4) for t in triad_reps],
            "battery": [round(t, 4) for t in bat_reps],
            "pass": [round(t, 4) for t in pass_reps],
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec), flush=True)
    dest = os.path.join(_REPO, "results", "round5_roofline.jsonl")
    with open(dest, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
