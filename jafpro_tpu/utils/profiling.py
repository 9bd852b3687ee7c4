"""Tracing / profiling helpers.

The reference profiles with ad-hoc ``time.time()`` deltas
(``train/4.convLSTM_flowpro_interval.py:182-204``).  Here: a step timer with
device synchronization plus ``jax.profiler`` trace capture for TensorBoard's
profile plugin (the proper tool on TPU).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def step_timer(sync: bool = True) -> Iterator[dict]:
    """``with step_timer() as t: ...`` -> t['seconds'] afterwards."""
    out = {}
    t0 = time.perf_counter()
    yield out
    if sync:
        jax.effects_barrier()
    out["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
