"""Profiling helpers (SURVEY.md section 5: the reference's tracing story
is time.time() + wandb; here: structured per-step timing + optional
jax.profiler traces for xprof/tensorboard)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/xprof.

    >>> with trace("/tmp/jax-trace"):
    ...     step(state, batch)  # traced
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with EMA — the reference logs raw
    time_per_step to wandb (train.py:116-119); this adds a smoothed view
    and an items/sec rate."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.last = dt
        self._avg = dt if self._avg is None else self._ema * self._avg + (1 - self._ema) * dt

    @property
    def avg(self) -> float:
        return self._avg if self._avg is not None else 0.0

    def rate(self, items: int) -> float:
        return items / self.avg if self.avg else 0.0
