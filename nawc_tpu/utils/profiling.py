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


def device_sync(x) -> float:
    """Force execution of everything `x` depends on and return a scalar.

    On the axon remote-TPU backend, ``jax.block_until_ready`` can return
    before the computation has actually executed (buffers report ready
    while the work is still queued server-side) — measured round 3: a
    chain of 6 codec encodes "blocked" in 7.8 ms and then took 284 s to
    fetch.  A device-to-host fetch of a scalar reduction is the only
    trusted barrier; its transfer cost (4 bytes) is negligible.  Use this
    (not block_until_ready) around anything timed.
    """
    import jax.numpy as jnp
    import numpy as np

    leaves = jax.tree_util.tree_leaves(x)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return float(np.asarray(acc))
