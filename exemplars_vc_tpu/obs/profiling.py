"""Profiling hooks: wall timers + jax.profiler traces.

Replaces the reference's cProfile wrappers and time.time() prints
(``01_make_dict.py:335-341``, ``04_align_n_nmf.py:436,470``, SURVEY §5.1)
with device-aware timing (block_until_ready) and XLA trace capture."""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that synchronizes device work.

    >>> with Timer("nmf") as t: result = f(x)
    >>> t.elapsed
    """

    def __init__(self, name: str = "", sync: bool = True):
        self.name = name
        self.sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        if self.sync:
            jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            jax.effects_barrier()
        self.elapsed = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace (inspect with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
