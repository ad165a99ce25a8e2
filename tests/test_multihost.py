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
