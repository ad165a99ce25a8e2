"""Small linear-algebra helpers shared across the engine.

``matvec`` exists because of an XLA:CPU pathology observed on this stack
(jax 0.9): compiling a default-precision dot with small/ragged shapes can
take minutes in the CPU backend's dot autotuner, while requesting
``precision=HIGHEST`` compiles in well under a second.  CPU is our test and
multi-chip-dryrun platform (virtual-device mesh), so we pin HIGHEST there;
on TPU the default precision keeps the MXU on its fast path.
"""

from __future__ import annotations

import jax

from jax import lax

__all__ = ["matvec"]


def _precision():
    return lax.Precision.HIGHEST if jax.default_backend() == "cpu" else None


def matvec(beta, Xt):
    """eta = beta @ Xt for beta (d,) and Xt (d, n) -> (n,)."""
    return lax.dot_general(
        beta, Xt, (((0,), (0,)), ((), ())), precision=_precision()
    )
