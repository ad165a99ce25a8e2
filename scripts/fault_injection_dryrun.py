"""Fault-injection restart dryrun: kill a worker mid-collection, restart,
restore, and prove bitwise continuation (SURVEY §5 failure detection /
elastic recovery; VERDICT r4 #7).

The reference has no failure story at all — a failed future fails the
whole lapply (R/slice_utilities.R:72-79).  Here the recovery unit is the
periodic checkpoint of the sharded freerun state (checkpoint.py): chains
carry their full PRNG state, so a restore replays the exact draws the
crashed run would have produced.

Timeline (2 processes x 4 virtual CPU devices, one 8-device chain mesh):

  phase 1 (faulted run):
    warmup -> CheckpointManager.save(state0)
    chunk1 = run(state0, 4)      both workers record their shard bytes
    chunk2 = run(state1, 3)      worker 1 SIGKILLs ITSELF (os.kill,
                                 SIGKILL — no cleanup, no atexit) right
                                 before chunk2; worker 0 — whose freerun
                                 path has zero collectives — completes
                                 chunk2, records it, then DETECTS the
                                 dead peer as a timeout on the end-of-run
                                 barrier and exits with code 3.
  phase 2 (restarted run):
    fresh processes, fresh jax.distributed runtime (new port), restore
    the checkpoint -> re-run chunk1 + chunk2.
    Assert: chunk1 draws bitwise match EVERY worker's pre-fault record;
    chunk2 draws bitwise match the surviving worker's pre-fault record.

Usage:  python scripts/fault_injection_dryrun.py         # launcher
"""

import argparse
import os
import signal
import subprocess
import sys
import tempfile
import threading

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_PROC = 2
DEVS_PER_PROC = 4
BASE_PORT = int(os.environ.get("FAULT_DRYRUN_PORT", "52521"))
CHUNK1, CHUNK2 = 4, 3


def _setup(process_id: int, port: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mcmcglm_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROC

    import numpy as np

    import mcmcglm_tpu as mg
    from mcmcglm_tpu.parallel import ShardedFreeRunCGGibbs, make_mesh

    rng = np.random.default_rng(0)  # identical data on every process
    n, d = 96, 5
    X = np.column_stack([np.ones(n), rng.normal(size=(n, d - 1))])
    beta_true = rng.normal(size=d)
    y = rng.binomial(1, 1 / (1 + np.exp(-X @ beta_true))).astype(float)
    fr = ShardedFreeRunCGGibbs(
        X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d),
        tuning={"w": 0.5}, mesh=make_mesh(8, 1),
    )
    return jax, np, fr


def _shard_bytes(np, arr):
    """This process's addressable shard data, concatenated (the unit of
    the bitwise-continuation assertion)."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    return np.concatenate([np.asarray(s.data).ravel() for s in shards])


def worker_faulted(process_id: int, ckpt_dir: str, rec_dir: str):
    jax, np, fr = _setup(process_id, BASE_PORT)
    from mcmcglm_tpu.checkpoint import CheckpointManager

    st = fr.init(jax.random.key(0), 16)
    st, _, _ = fr.warmup(st, 10)
    cm = CheckpointManager(ckpt_dir)
    cm.save(1, st)
    cm.close()

    st, draws1, _ = fr.run(st, CHUNK1)
    jax.block_until_ready(draws1)
    np.save(os.path.join(rec_dir, f"chunk1_p{process_id}.npy"),
            _shard_bytes(np, draws1))

    if process_id == 1:
        # the fault: a REAL mid-run kill — no cleanup, no flushing,
        # exactly what an OOM-killer or preemption does
        print("FAULT_INJECTED", flush=True)
        os.kill(os.getpid(), signal.SIGKILL)

    # surviving worker: the chain-sharded freerun path has no
    # collectives, so its chunk2 completes against the dead peer
    st, draws2, _ = fr.run(st, CHUNK2)
    jax.block_until_ready(draws2)
    np.save(os.path.join(rec_dir, f"chunk2_p{process_id}.npy"),
            _shard_bytes(np, draws2))

    # failure DETECTION: the end-of-run barrier cannot complete with a
    # dead peer — a bounded wait turns the hang into a detected fault
    from mcmcglm_tpu.parallel import distributed

    done = threading.Event()

    def barrier():
        try:
            distributed.sync_global_devices("faulted-run-done")
            done.set()
        except Exception:
            pass  # a raising barrier is also a detection

    th = threading.Thread(target=barrier, daemon=True)
    th.start()
    th.join(timeout=20)
    if not done.is_set():
        print("PEER_FAILURE_DETECTED", flush=True)
        os._exit(3)  # barrier thread is still blocked: exit hard
    print("UNEXPECTED_CLEAN_BARRIER", flush=True)
    os._exit(4)


def worker_resume(process_id: int, ckpt_dir: str, rec_dir: str):
    jax, np, fr = _setup(process_id, BASE_PORT + 7)
    from mcmcglm_tpu.checkpoint import CheckpointManager

    st_template = fr.init(jax.random.key(0), 16)
    st_template, _, _ = fr.warmup(st_template, 10)
    cm = CheckpointManager(ckpt_dir)
    restored = cm.restore(st_template)
    assert restored is not None, "checkpoint missing after fault"
    step, st, _ = restored
    assert step == 1
    cm.close()

    st, draws1, _ = fr.run(st, CHUNK1)
    st, draws2, _ = fr.run(st, CHUNK2)
    jax.block_until_ready((draws1, draws2))

    # bitwise continuation: chunk1 matches BOTH workers' pre-fault
    # records; chunk2 matches the surviving worker's record
    got1 = _shard_bytes(np, draws1)
    ref1 = np.load(os.path.join(rec_dir, f"chunk1_p{process_id}.npy"))
    np.testing.assert_array_equal(got1, ref1)
    got2 = _shard_bytes(np, draws2)
    assert np.isfinite(got2).all()
    if process_id == 0:
        ref2 = np.load(os.path.join(rec_dir, "chunk2_p0.npy"))
        np.testing.assert_array_equal(got2, ref2)

    from mcmcglm_tpu.parallel import distributed

    distributed.sync_global_devices("resume-done")
    if process_id == 0:
        print("FAULT_DRYRUN_OK", flush=True)


def _spawn(phase: str, ckpt_dir: str, rec_dir: str):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--phase", phase, "--ckpt-dir", ckpt_dir, "--rec-dir", rec_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROC)
    ]


def launch():
    with tempfile.TemporaryDirectory() as ckpt_dir, \
            tempfile.TemporaryDirectory() as rec_dir:
        # phase 1: the faulted run
        procs = _spawn("fault", ckpt_dir, rec_dir)
        outs = [p.communicate(timeout=600)[0] for p in procs]
        ok_fault = (
            procs[0].returncode == 3
            and "PEER_FAILURE_DETECTED" in outs[0]
            and procs[1].returncode == -signal.SIGKILL
            and "FAULT_INJECTED" in outs[1]
        )
        if not ok_fault:
            for i, o in enumerate(outs):
                sys.stderr.write(
                    f"--- fault worker {i} rc={procs[i].returncode} ---\n{o}\n"
                )
            sys.exit(1)
        print("fault phase: worker 1 SIGKILLed, worker 0 detected the "
              "dead peer (rc=3)", flush=True)

        # phase 2: restart + restore + bitwise continuation
        procs = _spawn("resume", ckpt_dir, rec_dir)
        outs = [p.communicate(timeout=600)[0] for p in procs]
        rc = procs[0].returncode | procs[1].returncode
        if rc != 0 or "FAULT_DRYRUN_OK" not in outs[0]:
            for i, o in enumerate(outs):
                sys.stderr.write(
                    f"--- resume worker {i} rc={procs[i].returncode} ---\n{o}\n"
                )
            sys.exit(1)
        print("FAULT_DRYRUN_OK (launcher)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--phase", choices=("fault", "resume"), default=None)
    ap.add_argument("--ckpt-dir", type=str, default=None)
    ap.add_argument("--rec-dir", type=str, default=None)
    args = ap.parse_args()
    if args.worker is None:
        launch()
    elif args.phase == "fault":
        worker_faulted(args.worker, args.ckpt_dir, args.rec_dir)
    else:
        worker_resume(args.worker, args.ckpt_dir, args.rec_dir)
