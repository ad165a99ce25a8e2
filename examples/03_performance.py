"""CGGibbs update-vs-naive runtime comparison — the `performance` vignette.

Mirrors vignettes/performance.Rmd:29-41: sweep model widths and compare
linear_predictor_calc="update" (O(n) per coordinate) against "naive"
(full matvec per slice evaluation), then plot time vs dimension.

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python examples/03_performance.py
"""

import mcmcglm_tpu as mg

df = mg.compare_eta_comptime_across_nvars(
    n_vars=[2, 50, 100, 200, 400],
    n=100,
    n_samples=100,
    burnin=0,
)
print(df[["n_vars", "linear_predictor_calc", "time", "compile_time"]].to_string(index=False))
fig = mg.plot_eta_comptime(df)
fig.savefig("eta_comptime.png", dpi=120)
print("wrote eta_comptime.png")
