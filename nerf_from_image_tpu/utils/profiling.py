"""Profiling helpers: jax.profiler traces + throughput counters.

The reference's only telemetry is wall-clock im/s (run.py:955, 1192-1198,
logged as `img_per_sec`); this module keeps that scalar and adds the
TPU-native tooling SURVEY §5 calls for: on-demand profiler traces
(viewable in TensorBoard / Perfetto) and a simple per-stage timer whose
results land in the same scalar logs.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Captures a jax.profiler trace around the enclosed steps.

    Usage:
        with profiling.trace('gan_logs/exp/trace', i % 1000 == 0):
            state, metrics = g_step(state, batch)
    """
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock per-stage timing with block_until_ready fencing.

    Results are exponential moving averages (stable under jit caching)
    retrievable as a scalar dict for the SummaryWriter.
    """

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.avg_ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_holder: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder[-1])
        dt = (time.perf_counter() - t0) * 1e3
        prev = self.avg_ms.get(name)
        self.avg_ms[name] = (dt if prev is None
                             else prev * self.decay + dt * (1 - self.decay))

    def scalars(self, prefix: str = 'profile/') -> Dict[str, float]:
        return {f'{prefix}{k}_ms': v for k, v in self.avg_ms.items()}


class Throughput:
    """im/s-compatible throughput counter (run.py:1193-1198 semantics)."""

    def __init__(self):
        self._t0 = None
        self.value = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int) -> float:
        if self._t0 is None:
            return 0.0
        self.value = items / max(time.perf_counter() - self._t0, 1e-9)
        return self.value
