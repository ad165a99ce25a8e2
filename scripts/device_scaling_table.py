"""Virtual-device scaling table for the chain-sharded freerun engine.

Mechanical demonstration of the chain-scaling design (VERDICT r2 #6):
the same total chain count is split over S = 1/2/4/8 mesh shards on a
virtual CPU device mesh and warm throughput is measured.  Because the
freerun run path compiles to ZERO cross-device collectives
(tests/test_sharding.py::TestZeroCollectives), sharding must add no
communication or synchronisation cost: on a fixed-core host the total
throughput should stay ~flat as S grows (each shard just runs a smaller
independent automaton), and on real multi-chip hardware — where each
shard owns a whole chip — the same program scales with chip count limited
only by per-shard tail effects (BASELINE: >=80% efficiency to N hosts).

This is a *mechanics* table, not a hardware-scaling benchmark: all S
virtual devices share this host's cores, so absolute numbers only show
that sharding costs nothing, not what N chips deliver.

Each device count needs its own XLA_FLAGS at process start, so the script
re-execs itself per S.

Run:  python scripts/device_scaling_table.py [--chains 64] [--sweeps 40]
Appends one JSON line per S; tee to results/.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(n_shards: int, n_chains: int, n_sweeps: int):
    sys.path.insert(0, _REPO)
    import jax
    import numpy as np

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.datagen import generate_glm_data
    from mcmcglm_tpu.parallel import make_mesh
    from mcmcglm_tpu.parallel.freerun_sharded import ShardedFreeRunCGGibbs

    assert len(jax.devices()) == n_shards, (len(jax.devices()), n_shards)
    n, d = 2000, 50
    X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
    eng = ShardedFreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        tuning={"w": 0.5}, mesh=make_mesh(n_shards, 1),
    )
    st = eng.init(jax.random.key(0), n_chains)
    st, _, _ = eng.warmup(st, 20)  # adapt widths; warm chains
    st, b, _ = eng.run(st, 5)  # compile the sampling executable
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    st, b, _ = eng.run(st, n_sweeps)
    jax.block_until_ready(b)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(b)).all()
    return {
        "n_shards": n_shards,
        "n_chains": n_chains,
        "n": n,
        "d": d,
        "timed_sweeps": n_sweeps,
        "seconds": round(dt, 3),
        "chain_sweeps_per_s": round(n_chains * n_sweeps / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=40)
    ap.add_argument("--_shards", type=int, default=0, help="internal")
    args = ap.parse_args()

    if args._shards:
        out = measure(args._shards, args.chains, args.sweeps)
        print(json.dumps(out), flush=True)
        return

    rows = []
    for s in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={s}"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--_shards", str(s), "--chains", str(args.chains),
             "--sweeps", str(args.sweeps)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if r.returncode:
            print(r.stderr, file=sys.stderr)
            raise SystemExit(f"S={s} failed")
        row = json.loads(r.stdout.strip().splitlines()[-1])
        rows.append(row)
    base = rows[0]["chain_sweeps_per_s"]
    for row in rows:
        row["relative_to_1_shard"] = round(row["chain_sweeps_per_s"] / base, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
