"""Render the example walkthroughs into docs/ with executed output.

The reference ships knitted vignettes whose chunks show real fitted tables
(/root/reference/vignettes/pospkg.Rmd:79-86 etc.) plus a pkgdown site; the
TPU repo's analogue is this renderer: each example script is executed and
its source + captured stdout are written as a markdown document under
docs/, so the docs always show numbers a reader can reproduce by running
the same file.

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/render_docs.py
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    (
        "01_families_and_priors.py",
        "Families and priors tour",
        "Every scenario of the reference's main vignette "
        "(`pospkg.Rmd`): gaussian/identity, binomial/logit, "
        "binomial/probit, poisson/log, negative binomial; iid, strongly "
        "misspecified, per-coordinate list and multivariate-normal priors; "
        "the elliptical slice kernels; the normal-normal conjugate "
        "cross-check.",
    ),
    (
        "02_customising.py",
        "Adding a new family",
        "The reference's extension recipe (`customising.Rmd`) is \"define "
        "a log_density S3 method\"; here it is one `register_family` call "
        "with a per-observation log-density, reproducing the vignette's "
        "inverse-gaussian model from scratch.",
    ),
    (
        "03_performance.py",
        "Update-vs-naive runtime",
        "The `performance.Rmd` methodology: sweep model widths, compare "
        "`linear_predictor_calc=\"update\"` (the O(n) CGGibbs increment) "
        "against `\"naive\"` (full matvec per slice evaluation), plot "
        "time against dimension.",
    ),
]


def main():
    docs = os.path.join(_REPO, "docs")
    os.makedirs(docs, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PYTHONPATH"] = _REPO
    index = [
        "# mcmcglm_tpu — rendered walkthroughs",
        "",
        "Executed-output equivalents of the reference package's knitted",
        "vignettes, produced by `scripts/render_docs.py` (re-run it to",
        "refresh the numbers).  Plots land next to the documents.",
        "",
    ]
    for fname, title, blurb in EXAMPLES:
        path = os.path.join(_REPO, "examples", fname)
        print(f"running {fname} ...", flush=True)
        r = subprocess.run(
            [sys.executable, path], env=env, capture_output=True,
            text=True, timeout=3600, cwd=docs,
        )
        if r.returncode:
            print(r.stdout)
            print(r.stderr, file=sys.stderr)
            raise SystemExit(f"{fname} failed")
        src = open(path).read()
        out_md = os.path.join(docs, fname.replace(".py", ".md"))
        with open(out_md, "w") as f:
            f.write(f"# {title}\n\n{blurb}\n\n")
            f.write(f"Source: [`examples/{fname}`](../examples/{fname}) — "
                    "run with `env PYTHONPATH= JAX_PLATFORMS=cpu python "
                    f"examples/{fname}`.\n\n")
            f.write("## Code\n\n```python\n")
            f.write(src.rstrip())
            f.write("\n```\n\n## Executed output\n\n```\n")
            f.write(r.stdout.rstrip())
            f.write("\n```\n")
            if "eta_comptime.png" in r.stdout:
                f.write("\n![update vs naive comptime](eta_comptime.png)\n")
        index.append(f"- [{title}]({fname.replace('.py', '.md')})")
        print(f"wrote {out_md}", flush=True)
    with open(os.path.join(docs, "README.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print("wrote docs/README.md", flush=True)


if __name__ == "__main__":
    main()
