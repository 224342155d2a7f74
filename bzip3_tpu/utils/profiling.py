"""Tracing / profiling helpers.

The reference has no in-tree tracing (SURVEY.md §5); its only
introspection is the CLI's -v stats.  The TPU framework gets:

- ``trace(path)`` — context manager around jax.profiler for device
  traces viewable in TensorBoard/XProf.
- ``StageTimer`` — lightweight wall-clock per-stage accounting used by
  the pipeline when BZ3_TPU_PROFILE=1.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace context (jax.profiler.trace)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates wall time per named stage; printable summary."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("BZ3_TPU_PROFILE", "0") == "1"
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:20s} {self.totals[name]*1e3:10.2f} ms  x{self.counts[name]}"
            )
        return "\n".join(lines)
