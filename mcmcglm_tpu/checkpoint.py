"""Checkpoint / resume for long sampling runs.

The reference has NO checkpointing: it holds the entire per-iteration
{beta, eta, mu} history in process memory and returns it at the end
(R/mcmcglm.R:188,227,282-295) — a failed run loses everything.  Here the
recovery unit is (chain state, collected samples, step counter), saved
periodically with orbax; a restart resumes from the last step
(SURVEY.md §5 'checkpoint/resume').

Works for both CGGibbs ChainState and FusedCGGibbs FusedState (any pytree
of arrays; typed PRNG keys are packed to raw key data on save and wrapped
back on restore).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CheckpointManager", "CHECKPOINT_FORMAT"]

# Payload format version.  Bump whenever a state field changes MEANING
# (not just structure — orbax catches structure mismatches itself): a
# silently restored stale semantic would contaminate every post-restore
# draw with no error.  History:
#   1: rounds 1-2 (freerun ld0 = ABSOLUTE log density)
#   2: round 3+   (freerun ld0 = RELATIVE log density — eta-independent
#      per-observation constants dropped; restoring a v1 ld0 would bias
#      the first slice test per coordinate by those constants)
CHECKPOINT_FORMAT = 2


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def _pack(tree):
    """Typed PRNG keys -> raw uint32 key data (orbax can't store extended
    dtypes)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _unpack(packed, template):
    return jax.tree.map(
        lambda t, x: jax.random.wrap_key_data(jnp.asarray(x)) if _is_key(t) else x,
        template,
        packed,
    )


class CheckpointManager:
    """Thin orbax wrapper for sampler state + collected draws.

    Layout: ``<directory>/<step>/`` orbax PyTree checkpoints of
    ``{"state": <pytree>, "samples": <array>, "step": int}``.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    @staticmethod
    def _to_host(tree):
        """device_get fully-addressable leaves; leave multi-host global
        arrays as jax.Arrays (orbax serialises each process's addressable
        shards in multi-host mode — a device_get there would fail)."""
        def f(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return jax.device_get(x)

        return jax.tree.map(f, tree)

    def save(self, step: int, state: Any, samples: Optional[np.ndarray] = None):
        # orbax refuses zero-size arrays: encode absence with a flag + sentinel
        has_samples = samples is not None
        payload = {
            "state": self._to_host(_pack(state)),
            "samples": np.asarray(samples) if has_samples else np.zeros((1,)),
            "has_samples": np.asarray(int(has_samples)),
            "step": np.asarray(step),
            "format": np.asarray(CHECKPOINT_FORMAT),
        }
        self._mgr.save(step, args=self._ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Returns (step, state, samples) or None if no checkpoint exists.

        ``state_template`` is a pytree with the target structure (e.g. a
        fresh ``engine.init(...)`` state) used to restore typed leaves,
        including re-wrapping PRNG keys."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None

        def t(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                # restore multi-host global arrays in-place with their
                # sharding (orbax reads each process's shards)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            return jax.device_get(x)

        template = {
            "state": jax.tree.map(t, _pack(state_template)),
            "samples": np.zeros((1,)),
            "has_samples": np.asarray(0),
            "step": np.asarray(0),
            "format": np.asarray(0),
        }
        try:
            payload = self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        except Exception as exc:
            # pre-format-tag checkpoints (rounds 1-2) fail the structure
            # match on the missing "format" key: refuse with the reason
            # instead of orbax's opaque tree-mismatch error.  Attach that
            # hint ONLY when the failure actually names the format key —
            # disk corruption, partial step dirs and sharding mismatches
            # must surface unrebranded or they misdirect debugging.
            if "format" in str(exc):
                raise ValueError(
                    f"checkpoint at step {step} could not be restored — "
                    "likely written before format tagging (format "
                    f"{CHECKPOINT_FORMAT} required; freerun ld0 semantics "
                    f"changed from absolute to relative log density): {exc}"
                ) from exc
            raise
        fmt = int(payload["format"])
        if fmt != CHECKPOINT_FORMAT:
            raise ValueError(
                f"checkpoint format {fmt} != supported {CHECKPOINT_FORMAT}; "
                "state field semantics differ (see CHECKPOINT_FORMAT "
                "history) — refusing a silently-biased restore"
            )
        state = _unpack(payload["state"], state_template)
        samples = (
            np.asarray(payload["samples"]) if int(payload["has_samples"]) else None
        )
        return int(payload["step"]), state, samples

    def close(self):
        self._mgr.close()
