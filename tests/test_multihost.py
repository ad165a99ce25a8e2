"""Multi-host runtime test: actually executes the jax.distributed path.

Spawned as subprocesses (2 processes x 4 virtual CPU devices -> one
8-device global mesh over gloo collectives) so the in-process test backend
is untouched.  Covers the branches that are unreachable single-process:
distributed.initialize with an explicit coordinator, make_array_from_
callback data placement (sharded_engine._put), shard_map and GSPMD
collectives across a process boundary, and orbax multi-host
checkpoint/restore (scripts/multihost_dryrun.py asserts bitwise
continuation after restore)."""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["MULTIHOST_DRYRUN_PORT"] = "52411"  # avoid collisions with manual runs
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "multihost_dryrun.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST_DRYRUN_OK" in out.stdout


@pytest.mark.slow
def test_fault_injection_restart():
    """SURVEY §5 failure detection / elastic recovery: SIGKILL one worker
    mid-collection, the survivor detects the dead peer at the barrier,
    and a restarted pair restores the checkpoint and reproduces the
    crashed run's draws BITWISE (scripts/fault_injection_dryrun.py)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["FAULT_DRYRUN_PORT"] = "52611"  # avoid collisions with manual runs
    out = subprocess.run(
        [sys.executable,
         os.path.join(_REPO, "scripts", "fault_injection_dryrun.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "FAULT_DRYRUN_OK" in out.stdout
