"""Profiling hooks: jax.profiler traces + per-step wall-clock timing.

The reference has no tracing/profiling at all (SURVEY.md section 5 — only
tqdm bars, train.py:402). Here every driver can wrap hot sections in
`annotate` (shows up as named ranges in a TensorBoard/Perfetto trace) and
capture a full device trace with `trace_to`.

Through the remote-TPU tunnel `block_until_ready` can return before device
completion; `sync()` forces a 1-element host readback, which is ordered
behind all queued work — use it around timing boundaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def annotate(name: str):
    """Named trace span (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace_to(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force completion of all queued device work ending at x."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


class StepTimer:
    """Rolling per-step timing with imgs/sec (replaces eyeballing tqdm)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def imgs_per_sec(self, batch: int) -> float:
        s = self.mean_step_seconds
        return batch / s if s == s and s > 0 else float("nan")
