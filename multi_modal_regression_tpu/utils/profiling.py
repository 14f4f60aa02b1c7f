"""Profiling helpers (the reference has only per-epoch tic/toc prints,
learnGeodesicBDModel.py:242-253; here: XLA-level traces + step timing).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard or xprof).

    Wrap a few training steps:
        with profile_trace('runs/x/profile'):
            for _ in range(5): state, m = step(state, batch)
            jax.block_until_ready(m)
    """
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Wall-clock throughput over a sliding window of steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t: list[float] = []
        self._n: list[int] = []

    def update(self, num_items: int) -> None:
        self._t.append(time.perf_counter())
        self._n.append(num_items)
        if len(self._t) > self.window + 1:
            self._t.pop(0)
            self._n.pop(0)

    @property
    def items_per_sec(self) -> float:
        if len(self._t) < 2:
            return 0.0
        dt = self._t[-1] - self._t[0]
        return sum(self._n[1:]) / max(dt, 1e-9)
