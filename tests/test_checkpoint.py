"""Checkpoint/resume round-trip tests (SURVEY.md §5)."""

import jax
import numpy as np
import pytest

import mcmcglm_tpu as mg
from mcmcglm_tpu.checkpoint import CheckpointManager


@pytest.fixture
def engine(readme_gaussian_data):
    X, y, _ = readme_gaussian_data
    return mg.CGGibbs(
        X, y, "gaussian", mg.IIDPrior(mg.Normal(0, 1), 3),
        extra={"sd": 1.0}, tuning={"w": 0.5},
    )


def test_roundtrip_resume(engine, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = engine.init(jax.random.key(0), 4)
    state, betas1, _ = engine.run(state, 20)
    mgr.save(20, state, np.asarray(betas1))

    # fresh process simulation: rebuild template, restore, continue
    template = engine.init(jax.random.key(0), 4)
    step, restored, samples = mgr.restore(template)
    assert step == 20
    assert samples.shape == (4, 20, 3)
    np.testing.assert_array_equal(samples, np.asarray(betas1))

    # the restored state must continue EXACTLY like the original
    cont_a, ba, _ = engine.run(state, 5)
    cont_b, bb, _ = engine.run(restored, 5)
    np.testing.assert_allclose(np.asarray(ba), np.asarray(bb), rtol=1e-6)
    mgr.close()


def test_latest_and_retention(engine, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = engine.init(jax.random.key(1), 2)
    for step in (5, 10, 15):
        mgr.save(step, state)
    assert mgr.latest_step() == 15
    template = engine.init(jax.random.key(1), 2)
    step, _, samples = mgr.restore(template)
    assert step == 15 and samples is None
    mgr.close()


def test_empty_dir(engine, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "none"))
    assert mgr.restore(engine.init(jax.random.key(0), 2)) is None
    mgr.close()
