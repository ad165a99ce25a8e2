"""Profiling helpers (SURVEY.md §5: the reference has nothing beyond
Sys.time() wall-clock deltas, R/measure_performance.R:16-26).

``trace(logdir)`` wraps ``jax.profiler.trace`` so any engine run can be
captured for TensorBoard/XProf; ``time_block`` is the wall-clock analogue
with explicit device synchronisation (block_until_ready) so XLA's async
dispatch can't fake timings.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "time_block", "Timer"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device profile of the enclosed block into ``logdir``."""
    with jax.profiler.trace(logdir, create_perfetto_link=create_perfetto_link):
        yield


class Timer:
    def __init__(self):
        self.seconds: Optional[float] = None


@contextlib.contextmanager
def time_block(sync=None):
    """Wall-clock a block; ``sync`` (any jax pytree) is block_until_ready'd
    before the clock stops.  Yields a Timer whose .seconds is set on exit."""
    t = Timer()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        t.seconds = time.perf_counter() - t0
