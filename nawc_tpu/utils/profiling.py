"""Tracing / profiling utilities.

The reference has no tracing at all (only tqdm bars, SURVEY.md §5).  Here:
xprof-compatible traces via jax.profiler, named-span annotations around
pipeline stages, and a lightweight wall-clock stage timer for quick CLI
summaries."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock per-stage timing with block_until_ready barriers."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if "result" in box:
                jax.block_until_ready(box["result"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s total  {t / n * 1e3:8.1f} ms/call  x{n}")
        return "\n".join(lines)
