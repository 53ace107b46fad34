"""Tracing / profiling helpers (SURVEY §5.1).

The reference times iterations with CUDA events (train.py:51-52,92,124) and
wall clock (pose_estimation/test.py:45,304-311). TPU-native equivalents:
XLA profiler traces viewable in TensorBoard/XProf + lightweight step timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: ``with trace("/tmp/trace"): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA wall-clock step timer (device-synchronizing)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.value_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays) -> float:
        if sync_arrays:
            jax.block_until_ready(sync_arrays)
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.value_ms = dt if self.value_ms is None else (
            self.ema * self.value_ms + (1 - self.ema) * dt
        )
        return dt


def time_fn(fn, *args, iters: int = 10, warmup: int = 1, **kwargs) -> Dict[str, float]:
    """Compile + steady-state timing of a jitted callable."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return {
        "compile_s": compile_s,
        "steady_ms": (time.perf_counter() - t0) / iters * 1000.0,
    }
