"""Profiling/tracing hooks.

The reference has no profiling beyond tqdm bars (SURVEY.md §5).  Here:

  * `trace(logdir)` — context manager around jax.profiler for XLA-level
    traces viewable in TensorBoard/Perfetto;
  * `summarize_trace(logdir)` — parse the trace back into a per-op
    device-time attribution (by `hlo_category`, with XLA's own
    model_flops/bytes counters) so `cli profile --trace-dir` prints an
    actionable table instead of leaving an opaque artifact — this is
    how the train-step roofline in DESIGN.md §4 / PROFILE_r03.json was
    measured;
  * `StepTimer` — wall-clock per-step timing with warmup discard and a
    forced value round-trip (on remote relays, dispatch returns before
    compute finishes — see bench.py), producing honest steps/sec;
  * `annotate` — TraceAnnotation passthrough for named regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

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


def summarize_trace(logdir: str, steps: int = 1) -> Dict[str, Dict[str, float]]:
    """Aggregate the newest trace under `logdir` into per-`hlo_category`
    device-time/FLOP/byte totals (divided by `steps` for per-step
    numbers).

    Reads the Chrome-trace JSON the profiler writes next to the xplane
    (``*.trace.json.gz``), keeps only device-lane complete events, and
    sums XLA's own counters.  Returns {} when no trace or no device
    events exist (e.g. tracing refused)."""
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "CPU" not in e.get("args", {}).get("name", "")
    }
    out: Dict[str, Dict[str, float]] = {}
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        args = e.get("args") or {}
        name = e.get("name", "")
        # skip enclosing program spans / numeric step markers so the
        # categories sum to device-busy time, not 2x it
        if name.startswith("jit_") or name.split(".")[0].isdigit():
            continue
        cat = args.get("hlo_category", "uncategorized")
        row = out.setdefault(
            cat, {"ms": 0.0, "gflops": 0.0, "gbytes": 0.0, "ops": 0.0}
        )
        row["ms"] += e.get("dur", 0) / 1000.0 / steps
        row["gflops"] += float(args.get("model_flops", 0) or 0) / 1e9 / steps
        row["gbytes"] += float(args.get("raw_bytes_accessed", 0) or 0) / 1e9 / steps
        row["ops"] += 1.0 / steps
    for row in out.values():
        row["ms"] = round(row["ms"], 3)
        row["gflops"] = round(row["gflops"], 2)
        row["gbytes"] = round(row["gbytes"], 3)
        row["ops"] = round(row["ops"], 1)
    return dict(sorted(out.items(), key=lambda kv: -kv[1]["ms"]))


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
