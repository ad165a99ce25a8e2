"""North-star benchmark: ESS/sec/chip on a p=1000 logistic GLM (BASELINE.md).

Engine: FreeRunCGGibbs (freerun.py) — lockstep-free automaton CGGibbs with
warmup-adapted slice widths and the m=1 shrink-only kernel.

Protocol
--------
* Fit BASELINE config: logistic regression, n=10k observations, p=1000
  coefficients, N(0,1) prior, slice CGGibbs, many vmapped chains on one
  chip.  The slice kernel defaults to ``quantile`` (Heiner et al. 2024;
  Cauchy(0, 2) pseudo-target): the six-kernel same-process A/B
  (results/round5_latent_ab.jsonl, 2026-08-22) measured the Cauchy(0,1)
  form at 1424.6 min-ESS/s vs 1226.2 for warmup-adapted stepping-out in
  the same window — ~1.5x fewer target evaluations per coordinate at
  near-identical per-draw mixing, with no per-coordinate width
  adaptation needed at all — and the same-process pseudo_scale ladder
  (results/round5_qscale_ladder.jsonl: 418 / 923 / 1426 / 1644 / 1567 /
  1429 / 1310 min-ESS/s at scale 0.25 / 0.5 / 1 / 2 / 3 / 4 / 6) peaks
  at scale 2: wider pseudo-targets buy per-draw mixing (0.67 -> 0.86
  min-ESS/draw) for a sub-linear evaluation-count cost until ~3.
  On top of that the bench enables ADAPTED pseudo-targets
  (``pseudo_adapt=True``, pseudo_c=3): per-(chain, coordinate) loc/scale
  tuned during warmup and frozen for sampling (Heiner et al. 2024's
  freeze-after-warmup recipe) — the same-process pseudo_c ladder
  (results/round5_quantile_adapt.jsonl: 1602 / 1718 / 1686 / 1639 /
  1402 / 1198 at c = 2 / 3 / 4 / 5 / 10 / 20 vs anchor 1638.6) peaks at
  c=3 with 2.03 evals/coord.  ``BENCH_PSEUDO_ADAPT=0`` restores the
  fixed Cauchy(0, 2) pseudo-target; ``BENCH_KERNEL=stepping_out``
  restores the reference's default kernel.
* Warm up (compile + burn-in), then time K sweeps; compute pooled bulk ESS
  per coordinate over the timed draws and report the MINIMUM across
  coordinates (the worst-mixing parameter) divided by wall time.
* ``vs_baseline``: the reference is pure single-chain R with no published
  numbers (BASELINE.md), so we measure a conservative stand-in on this
  machine: the same CGGibbs algorithm implemented in vectorised NumPy
  (strictly faster than the reference's R loop, which adds interpreter and
  closure overhead per evaluation — R/mcmcglm.R:239-262), credited with the
  maximum possible mixing of 1.0 ESS per sweep (ESS cannot exceed the draw
  count):
      baseline ESS/s = 1.0 * (numpy sweeps/s).
  The reported ratio therefore *understates* the true speedup over R.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

CACHE_DIR = "/root/repo/.jax_cache"
# battery self-selection marker: once a session has A/B'd the two
# front-runner kernels and timed them, later runs (the driver's
# end-of-round bench in particular) reuse that selection instead of
# warming BOTH candidates — the selection burst protocol cost ~120 s of
# compile per run even with a warm persistent cache (VERDICT r3 #4).
# Deleting the file (or changing the config) restores full self-selection.
MARKER = os.path.join(CACHE_DIR, "bench_selected.json")


def _read_marker(config):
    try:
        with open(MARKER) as fh:
            m = json.load(fh)
        if m.get("config") == list(config) and m.get("battery"):
            return m
    except Exception:
        pass
    return None


def _write_marker(config, battery, burst_rate):
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        with open(MARKER, "w") as fh:
            json.dump({"config": list(config), "battery": battery,
                       "burst_sweeps_per_sec": round(burst_rate, 3)}, fh)
    except Exception:
        pass


def _numpy_baseline_sweep_rate(X, y, w=0.5, n_sweeps=2, seed=0, prior_sd=1.0):
    """Single-chain CGGibbs in NumPy (reference-algorithm proxy): stepping-out
    slice per coordinate with the O(n) incremental eta update."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    beta = rng.normal(size=d) * prior_sd
    eta = X @ beta

    def loglik(e):
        # Bernoulli/logit: sum(y*eta - log1p(exp(eta)))
        return float(np.sum(y * e - np.logaddexp(0.0, e)))

    def logpost_from(bj, j, eta):
        e = eta + X[:, j] * (bj - beta[j])
        return loglik(e) - 0.5 * (bj / prior_sd) ** 2

    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        for j in range(d):
            f0 = logpost_from(beta[j], j, eta)
            level = f0 + np.log(rng.uniform())
            u = rng.uniform()
            L, R = beta[j] - w * u, beta[j] - w * u + w
            m = 128
            jj = int(m * rng.uniform())
            kk = m - 1 - jj
            while jj > 0 and logpost_from(L, j, eta) > level:
                L -= w
                jj -= 1
            while kk > 0 and logpost_from(R, j, eta) > level:
                R += w
                kk -= 1
            for _ in range(64):
                b1 = rng.uniform(L, R)
                if logpost_from(b1, j, eta) >= level:
                    break
                if b1 < beta[j]:
                    L = b1
                else:
                    R = b1
            eta = eta + X[:, j] * (b1 - beta[j])
            beta[j] = b1
    dt = time.perf_counter() - t0
    return n_sweeps / dt


def main():
    import jax

    # persistent compiled-executable cache: the remote compile service in
    # this environment intermittently wedges for 10-20 min; once one run's
    # compiles land in the on-disk cache, later runs skip the service
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.datagen import generate_glm_data
    from mcmcglm_tpu.diagnostics import ess
    from mcmcglm_tpu.freerun import FreeRunCGGibbs

    backend = jax.default_backend()
    on_accel = backend != "cpu"
    # BASELINE north-star config (scaled down on CPU so CI-ish runs finish)
    if on_accel:
        # C=256: the round-4 chain-count probe (results/
        # round4_c_scaling.log) put C=512 ~8% ahead on C*sweeps/s in its
        # own session, but two full bench sessions at C=512 measured
        # 1104 min-ESS/s (3.02 sweeps/s, twice, independently) vs 1226
        # at C=256 (6.97 sweeps/s, twice) — the bench protocol's chunked
        # collection favors the smaller state footprint, so the bench
        # stays at the measured optimum (round4_bench_s6/s7 logs).
        n, d, n_chains, burnin, timed_sweeps = 10_000, 1000, 256, 30, 120
        np_sweeps = 2
    else:
        n, d, n_chains, burnin, timed_sweeps = 2000, 100, 8, 30, 100
        np_sweeps = 3

    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    # the bench's engine configuration is free to be the measured best;
    # the reference-parity DEFAULT kernel of mcmcglm() stays stepping_out
    kernel = os.environ.get("BENCH_KERNEL", "quantile")
    # quantile pseudo-target scale: the measured ESS/s optimum (ladder in
    # the module docstring); ignored by the other kernels
    q_scale = float(os.environ.get("BENCH_PSEUDO_SCALE", "2.0"))
    # adapted pseudo-targets (Heiner et al. 2024 freeze-after-warmup):
    # per-(chain, coordinate) loc/scale tuned during the warmup below.
    # Same-process ladder (results/round5_quantile_adapt.jsonl): the
    # pseudo_c frontier peaks at 3 — 1718.3 min-ESS/s vs 1638.6 for the
    # fixed Cauchy(0, 2) anchor (+4.9%; 2.03 evals/coord at ESS/draw
    # 0.863).  BENCH_PSEUDO_ADAPT=0 restores the fixed pseudo-target.
    q_adapt = os.environ.get("BENCH_PSEUDO_ADAPT", "1") != "0"
    q_c = float(os.environ.get("BENCH_PSEUDO_C", "3.0"))
    if kernel != "quantile":
        q_adapt = False

    # the freerun engine (freerun.py): lockstep-free automaton scheduling,
    # warmup-adapted widths, shrink-only sampling kernel — measured 391
    # min-ESS/s vs ~150 for the scan/while XLA engine on v5e (C=256).
    # spec_k=4 K-speculative proposal batteries: both Pallas evaluators
    # ("pallas3" in-kernel gather, "pallas2" fused commit) beat the
    # classic pass by ~1.4-2x, but WHICH of the two is faster flips with
    # the tunnel window (same-process A/B sessions 3 vs 8-9 in
    # results/round3_battery_probes.log disagree), so the bench warms
    # BOTH and self-selects with a short in-process burst before the
    # timed section.  The chain still degrades gracefully to pallas/xla:
    # the remote compile service intermittently wedges or 500s on Mosaic
    # kernels, and the bench must produce a number regardless.
    t0 = time.perf_counter()
    config = (n, d, n_chains, kernel, q_scale, q_adapt, q_c)
    marker = _read_marker(config) if on_accel else None

    def _stage(label, t):
        print(f"# stage {label}: {time.perf_counter() - t:.1f}s",
              file=sys.stderr, flush=True)
        return time.perf_counter()

    burn_acc = [0.0]  # warmup EXECUTION time (reported as burnin_seconds)

    def _build(impl):
        t = time.perf_counter()
        eng = FreeRunCGGibbs(
            X,
            y,
            "binomial",
            mg.IIDPrior(mg.Normal(0.0, 1.0), d),
            # one tuning dict serves both kernels: stepping_out reads w
            # (then warmup-adapts it) and ignores the pseudo-target
            # params; quantile the reverse
            tuning={"w": 0.5, "pseudo_scale": q_scale,
                    "pseudo_adapt": q_adapt, "pseudo_c": q_c},
            slice_kernel=kernel,
            spec_k=4 if on_accel else 1,
            battery_impl=impl if on_accel else "auto",
        )
        t = _stage(f"{impl} construct", t)
        state = eng.init(jax.random.key(0), n_chains)
        jax.block_until_ready(state.beta)
        t = _stage(f"{impl} init", t)
        # adaptive warmup (tunes per-(chain, coordinate) slice widths;
        # two-phase: a few stepping-out sweeps, then shrink-only + adapt)
        tw = time.perf_counter()
        state, _, _ = eng.warmup(state, burnin)
        jax.block_until_ready(state.beta)
        burn_acc[0] += time.perf_counter() - tw
        _stage(f"{impl} warmup({burnin})", t)
        return eng, state

    cache_hit = False
    if marker is not None:
        # warm path: a previous session already self-selected; warm ONLY
        # the winner (persistent .jax_cache makes its compiles disk hits)
        try:
            eng, state = _build(marker["battery"])
            chosen = marker["battery"]
            cache_hit = True
            print(f"# marker: reusing selected battery_impl={chosen}",
                  file=sys.stderr, flush=True)
        except Exception as exc:
            print(f"# marker battery {marker['battery']} failed "
                  f"({type(exc).__name__}); re-selecting",
                  file=sys.stderr, flush=True)
            marker = None
    if marker is None:
        candidates = (
            ["pallas3", "pallas2", "pallas", "xla"] if on_accel else ["auto"]
        )
        warmed = []  # (burst_rate, impl, eng, state)
        for impl in candidates:
            try:
                eng, state = _build(impl)
                if not on_accel:
                    warmed.append((0.0, impl, eng, state))
                    break
                # selection burst: short timed run on the warm sampler
                # (one executable shape: compile run(8), then time run(8))
                state, _, _ = eng.run(state, 8)
                jax.block_until_ready(state.beta)
                tb = time.perf_counter()
                state, b, _ = eng.run(state, 8)
                jax.block_until_ready(b)
                rate = 8.0 / (time.perf_counter() - tb)
                print(f"# burst {impl}: {rate:.3f} sweeps/s",
                      file=sys.stderr, flush=True)
                warmed.append((rate, impl, eng, state))
                if len(warmed) == 2:
                    break  # the two front-runners are enough
            except Exception as exc:  # compile/lowering failure: step down
                print(f"# battery_impl={impl} failed ({type(exc).__name__}); "
                      "falling back", file=sys.stderr, flush=True)
        if not warmed:
            raise RuntimeError("all battery implementations failed")
        warmed.sort(key=lambda t: -t[0])
        burst_rate, chosen, eng, state = warmed[0]
        print(f"# selected battery_impl={chosen}", file=sys.stderr, flush=True)
        if on_accel:
            _write_marker(config, chosen, burst_rate)
    # compile_seconds = setup MINUS warmup execution (warmup runs real
    # burn-in sweeps; that time is burnin_seconds, not compile cost —
    # the r3 bench folded it into compile_seconds, overstating compiles)
    burn_s = burn_acc[0]
    compile_s = time.perf_counter() - t0 - burn_s

    # chunk dispatches: long single executions can exceed remote-runtime
    # RPC deadlines (observed as UNAVAILABLE device errors).  Draws stay on
    # device during the timed section — host transfer is not part of the
    # sampler's throughput (and is tunnel-bound in this environment).
    chunk = 30
    state, _, _ = eng.run(state, chunk)  # compile the sampling executable
    jax.block_until_ready(state.beta)
    nev0 = np.asarray(state.nev).copy()

    t0 = time.perf_counter()
    parts_dev = []
    done = 0
    while done < timed_sweeps:
        step = min(chunk, timed_sweeps - done)
        state, betas, _ = eng.run(state, step)
        parts_dev.append(betas)
        done += step
    jax.block_until_ready(parts_dev)
    timed_s = time.perf_counter() - t0

    # -- roofline probe (VERDICT r4 #3): time EXACT device passes --------
    # run_passes with an unreachable sweep quota executes exactly
    # n_passes automaton passes (all lanes active, 1-slot dummy buffers),
    # so seconds/pass is measured directly instead of inferred from
    # sweeps.  bytes_per_pass uses the selected battery's established
    # stream count x the padded (C, n) operand (module docstrings in
    # ops/freerun_batteries.py; pass-budget logs in results/README.md):
    # pallas3 = 3 streams (read eta, read X rows, write eta),
    # pallas2 = 5 (the XLA row gather's read+write + kernel read eta/xg
    # + write eta), pallas = 6, xla battery/classic ~ 3 + 2K.  With these
    # fields a tunnel-degraded bench window is self-evident: pct_hbm_peak
    # collapses with the window while the model stays fixed.
    from functools import partial as _partial

    import jax.numpy as jnp

    probe_passes = 1500 if on_accel else 20
    pass_probe = jax.jit(_partial(
        eng._run_pass_block, n_sweeps=1 << 30, n_passes=probe_passes,
        adapt=False, shrink_only=True,
    ))
    sc0 = jnp.zeros((n_chains,), jnp.int32)
    st_p, _ = pass_probe(state, sc0)  # compile
    jax.block_until_ready(st_p.beta)
    tp = time.perf_counter()
    st_p, _ = pass_probe(st_p, sc0)
    jax.block_until_ready(st_p.beta)
    pass_s = (time.perf_counter() - tp) / probe_passes
    n_pad = int(np.prod(eng.Xt.shape[1:]))
    streams = {"pallas3": 3, "pallas2": 5, "pallas": 6}.get(
        eng.battery_impl, 3 + 2 * eng.spec_k
    )
    bytes_per_pass = streams * n_chains * n_pad * 4
    hbm_gbps = bytes_per_pass / pass_s / 1e9
    # v5e HBM peak 819 GB/s; other chips: field is labeled, not silent
    hbm_peak = 819.0
    pct_hbm_peak = 100.0 * hbm_gbps / hbm_peak

    draws = np.concatenate([np.asarray(p) for p in parts_dev], axis=1)  # (C, K, d)
    n_evals = (np.asarray(state.nev) - nev0) / timed_sweeps
    ess_all = ess(draws)
    min_ess = float(np.min(ess_all))
    med_ess = float(np.median(ess_all))
    ess_per_sec = min_ess / timed_s

    # Baseline credit: a sweep of coordinate-wise slice sampling yields AT
    # MOST 1 effective draw per sweep (ESS <= number of draws), so crediting
    # the single-chain baseline with exactly 1.0 ESS per sweep is the
    # conservative (most favorable to the baseline) conversion.
    np_rate = _numpy_baseline_sweep_rate(X, y, n_sweeps=np_sweeps)
    baseline_ess_per_sec = 1.0 * np_rate
    vs_baseline = ess_per_sec / baseline_ess_per_sec if baseline_ess_per_sec else None

    print(
        json.dumps(
            {
                "metric": f"min_ess_per_sec_p{d}_logistic_1chip",
                "value": round(ess_per_sec, 3),
                "unit": "ESS/s",
                "vs_baseline": round(vs_baseline, 2),
                "backend": backend,
                "n": n,
                "d": d,
                "n_chains": n_chains,
                "timed_sweeps": timed_sweeps,
                "timed_seconds": round(timed_s, 3),
                "compile_seconds": round(compile_s, 2),
                "burnin_seconds": round(burn_s, 2),
                "median_ess_per_sec": round(med_ess / timed_s, 3),
                "sweeps_per_sec": round(timed_sweeps / timed_s, 3),
                "slice_evals_per_sweep": round(float(np.mean(np.asarray(n_evals))), 2),
                "baseline_proxy_sweeps_per_sec": round(np_rate, 4),
                "baseline_proxy_ess_per_sec": round(baseline_ess_per_sec, 4),
                "battery": getattr(eng, "battery_impl", None),
                "slice_kernel": kernel,
                "pseudo_adapt": q_adapt,
                "selection_cache_hit": cache_hit,
                "pass_microseconds": round(pass_s * 1e6, 2),
                "bytes_per_pass": bytes_per_pass,
                "modeled_streams_per_pass": streams,
                "hbm_gbps": round(hbm_gbps, 1),
                "pct_hbm_peak": round(pct_hbm_peak, 1),
                "hbm_peak_gbps_assumed": hbm_peak,
                "note": (
                    "remote-tunnel throughput drifts up to ~2x between "
                    "sessions; same-process A/B ladders in "
                    "results/round3_battery_probes.log are the "
                    "tunnel-invariant comparisons"
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
