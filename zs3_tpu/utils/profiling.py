"""Profiling/tracing hooks.

The reference has no profiling beyond tqdm bars (SURVEY.md §5).  Here:

  * `trace(logdir)` — context manager around jax.profiler for XLA-level
    traces viewable in TensorBoard/Perfetto;
  * `StepTimer` — wall-clock per-step timing with warmup discard and a
    forced value round-trip (on remote relays, dispatch returns before
    compute finishes — see bench.py), producing honest steps/sec;
  * `annotate` — TraceAnnotation passthrough for named regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def force(value) -> float:
    """Force completion of a computation by pulling one scalar."""
    leaf = jax.tree.leaves(value)[0]
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


class StepTimer:
    """Accumulates per-step wall times; discards the first (compile) step."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = []
        self._count = 0
        self._last: Optional[float] = None

    def __enter__(self):
        self._last = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else float("nan")

    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m and np.isfinite(m) and m > 0 else 0.0
