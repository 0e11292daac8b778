"""Tracing / profiling helpers (aux subsystem; the reference has none,
SURVEY §5 — only a progress bar and score printouts).

- `trace(dir)`: context manager around jax.profiler for device traces
  viewable in TensorBoard / Perfetto.
- `StageTimer`: lightweight named wall-clock stage accumulator with
  device-sync, for per-frame latency breakdowns in the detect loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<24} {total*1000:8.2f} ms total  {total/n*1000:8.2f} ms/call  x{n}")
        return "\n".join(lines)
