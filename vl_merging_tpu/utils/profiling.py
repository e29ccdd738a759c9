"""Profiling & observability.

The reference's only instrumentation is nvidia-smi at startup and a CUDA
peak-memory print (reference: src/run.py:151,
src/cache_gram_matrices.py:351-357).  Here: jax.profiler traces, a
step-timer with rolling throughput, and device-memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + examples/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.time())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats (the TPU analogue of
    torch.cuda.max_memory_allocated)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
                "bytes_limit": stats.get("bytes_limit", -1),
            }
    return out


def print_memory_report() -> None:
    for dev, s in device_memory_stats().items():
        peak = s["peak_bytes_in_use"] / 1024 ** 3
        limit = s["bytes_limit"] / 1024 ** 3
        print(f"{dev}: peak {peak:.2f} GiB / {limit:.2f} GiB")
