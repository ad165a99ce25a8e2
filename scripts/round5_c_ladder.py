"""Round-5 C-ladder (VERDICT r4 #3): diagnose the C=512 min-ESS/s anomaly.

Round-4 saw C*sweeps/s flat across C in {256, 512, 1024} (HBM-bound) yet
two full bench sessions measured C=512 ~10% LOWER min-ESS/s than C=256,
and the bench was pinned to 256 without a recorded diagnosis.  The two
candidate explanations:

  (a) estimation/protocol: the bench's chunked run() imposes a full
      cross-chain barrier every 30 sweeps, and the slowest-lane tail
      grows with C — a protocol cost, not a sampler cost.  The
      barrier-free run_passes collection pays ONE tail for the whole
      window.
  (b) genuine per-draw mixing loss at higher C — impossible in law
      (chains are i.i.d.; the per-chain kernel does not see C), so any
      ESS/draw drop would indicate an estimator artifact instead.

Protocol: same process, same battery impl for every C; for each
C in {256, 512, 1024} time BOTH collection modes over the same 120
sweeps/chain and record sweeps/s, C*sweeps/s, min/median pooled ESS,
min-ESS/s, and ESS per draw.  Appends JSONL rows to
results/round5_c_ladder.jsonl.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.datagen import generate_glm_data
    from mcmcglm_tpu.diagnostics import ess
    from mcmcglm_tpu.freerun import FreeRunCGGibbs

    on_accel = jax.default_backend() != "cpu"
    n, d = (10_000, 1000) if on_accel else (2000, 100)
    sweeps = 120 if on_accel else 40
    burn = 30
    ladder = (256, 512, 1024) if on_accel else (8, 16)
    battery = os.environ.get("LADDER_BATTERY", "pallas2")
    dest = os.path.join(_REPO, "results", "round5_c_ladder.jsonl")

    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    rows = []
    for C in ladder:
        t0 = time.perf_counter()
        eng = FreeRunCGGibbs(
            X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            tuning={"w": 0.5}, spec_k=4 if on_accel else 1,
            battery_impl=battery if on_accel else "auto",
        )
        state = eng.init(jax.random.key(0), C)
        state, _, _ = eng.warmup(state, burn)
        jax.block_until_ready(state.beta)
        print(f"# C={C} setup {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

        # -- mode A: chunked run() (the round-4 bench protocol) ----------
        chunk = 30
        state, _, _ = eng.run(state, chunk)  # compile
        jax.block_until_ready(state.beta)
        tA = time.perf_counter()
        parts = []
        done = 0
        while done < sweeps:
            state, b, _ = eng.run(state, chunk)
            parts.append(b)
            done += chunk
        jax.block_until_ready(parts)
        timeA = time.perf_counter() - tA
        drawsA = np.concatenate([np.asarray(p) for p in parts], axis=1)

        # -- mode B: barrier-free run_passes (one tail for the window) ---
        # warm with the SAME (n_sweeps, n_passes) as the timed loop:
        # n_passes is baked into the executable and its cache key
        # (ADVICE r4: a different warm quota compiles the wrong program
        # and the first timed dispatch pays a full compile)
        per_dispatch = 1500 if on_accel else 500
        st, _, _, _ = eng.run_passes(state, None, None, None, sweeps,
                                     per_dispatch)
        jax.block_until_ready(st.beta)
        sc = dr = nb = None
        tB = time.perf_counter()
        while True:
            st, sc, dr, nb = eng.run_passes(st, sc, dr, nb, sweeps,
                                            per_dispatch)
            if (np.asarray(sc) >= sweeps).all():
                break
        timeB = time.perf_counter() - tB
        drawsB = np.asarray(dr)

        for mode, draws, tsec in (("chunked_run", drawsA, timeA),
                                  ("run_passes", drawsB, timeB)):
            e = ess(draws)
            row = {
                "C": C, "mode": mode, "battery": eng.battery_impl,
                "sweeps": sweeps, "seconds": round(tsec, 3),
                "sweeps_per_sec": round(sweeps / tsec, 3),
                "chain_sweeps_per_sec": round(C * sweeps / tsec, 1),
                "min_ess": round(float(np.min(e)), 1),
                "median_ess": round(float(np.median(e)), 1),
                "min_ess_per_sec": round(float(np.min(e)) / tsec, 1),
                "min_ess_per_draw": round(
                    float(np.min(e)) / (C * sweeps), 4
                ),
                "median_ess_per_draw": round(
                    float(np.median(e)) / (C * sweeps), 4
                ),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(dest, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    # run_passes compile note: mode B at a different quota is a separate
    # executable; its compile happened outside the timed window above.
    print("# ladder done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
