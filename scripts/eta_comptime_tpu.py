"""File the TPU update-vs-naive scaling curve (VERDICT round-1 item #2).

The reference's one quantitative claim is that CGGibbs total runtime is
LINEAR in the parameter count d (incremental O(n) eta update per
coordinate) versus QUADRATIC for the naive full-matvec recompute
(/root/reference/README.md:11-16, R/measure_performance.R:113-151).  This
script reproduces that curve on TPU with the comptime harness (perf.py),
writes one JSON line per (d, method) to
results/round2_eta_comptime_tpu.jsonl, and appends a summary line with the
fitted log-log slopes (update ~ 1, naive ~ 2).

Run: python scripts/eta_comptime_tpu.py [--small]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mcmcglm_tpu.perf import compare_eta_comptime_across_nvars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default="results/round2_eta_comptime_tpu.jsonl")
    args = ap.parse_args()

    if args.small:
        n_vars, n, n_samples, n_chains = [50, 100, 200], 200, 20, 4
    else:
        # reference methodology uses n=100 obs and sweeps n_vars
        # (vignettes/performance.Rmd:30-36); on TPU we scale n and d up so
        # the timed region is device work, not dispatch overhead
        n_vars, n, n_samples, n_chains = [250, 500, 1000, 2000, 4000], 1000, 30, 8

    df = compare_eta_comptime_across_nvars(
        n_vars, n=n, n_samples=n_samples, n_chains=n_chains, w=0.5,
    )

    rows = []
    with open(args.out, "w") as fh:
        for _, r in df.iterrows():
            row = {
                "d": int(r["n_vars"]),
                "method": r["linear_predictor_calc"],
                "seconds": round(float(r["time"]), 4),
                "compile_s": round(float(r["compile_time"]), 2),
                "n": int(r["n_obs"]),
                "n_samples": int(r["n_samples"]),
                "n_chains": int(r["n_chains"]),
            }
            rows.append(row)
            fh.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)

        # fitted log-log slopes over the upper half of the d range (where
        # device work dominates fixed dispatch cost)
        summary = {"summary": "loglog_slopes"}
        for method in ("update", "naive"):
            pts = sorted((r["d"], r["seconds"]) for r in rows if r["method"] == method)
            ds = np.log([p[0] for p in pts])
            ts = np.log([p[1] for p in pts])
            half = len(pts) // 2
            slope = float(np.polyfit(ds[half - 1:], ts[half - 1:], 1)[0])
            summary[f"{method}_slope"] = round(slope, 3)
        ratio_small = next(r["seconds"] for r in rows if r["method"] == "naive" and r["d"] == n_vars[0]) / next(
            r["seconds"] for r in rows if r["method"] == "update" and r["d"] == n_vars[0])
        ratio_big = next(r["seconds"] for r in rows if r["method"] == "naive" and r["d"] == n_vars[-1]) / next(
            r["seconds"] for r in rows if r["method"] == "update" and r["d"] == n_vars[-1])
        summary["naive_over_update_at_dmin"] = round(float(ratio_small), 2)
        summary["naive_over_update_at_dmax"] = round(float(ratio_big), 2)
        fh.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
