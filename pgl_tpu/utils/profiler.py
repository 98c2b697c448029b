"""Profiling helpers — first-class where the reference has only ad-hoc
``time.time()`` stage logs (SURVEY.md §5): ``jax.profiler`` trace capture
plus a lightweight stage timer whose report prints per-stage totals.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

from .logger import log

__all__ = ["StageTimer", "trace", "annotate"]


class StageTimer:
    """Accumulating wall-clock stage timer.

    with timer.stage("sample"): ...
    with timer.stage("train"):  ...
    timer.report()
    """

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if self.sync and sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self, reset: bool = False) -> Dict[str, float]:
        out = dict(self.totals)
        for name in sorted(out):
            n = self.counts[name]
            log.info("stage %-16s total %8.3fs  calls %6d  avg %8.3fms",
                     name, out[name], n, out[name] / max(n, 1) * 1000)
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation
