"""Profiling and device-memory observability.

TPU-native replacement for the reference's profiler summary + CUDACallback
(`/root/reference/main.py:420-440,780`): `jax.profiler` traces viewable in
TensorBoard/Perfetto, per-step wall timing from ``block_until_ready``
deltas (no host-callback sync in the hot path), and HBM statistics from
``device.memory_stats()``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Profile a region: view with TensorBoard's profile plugin or
    Perfetto (`jax.profiler` trace)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[Any] = None) -> Dict[str, float]:
    """HBM usage in MiB (equivalent of torch.cuda.max_memory_allocated)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    mib = 1024 * 1024
    return {
        "bytes_in_use_mib": stats.get("bytes_in_use", 0) / mib,
        "peak_bytes_in_use_mib": stats.get("peak_bytes_in_use", 0) / mib,
        "bytes_limit_mib": stats.get("bytes_limit", 0) / mib,
    }


class StepTimer:
    """Wall-time per step with device sync only at measurement points."""

    def __init__(self):
        self._t0 = None
        self.history = []

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.history else 0.0


def epoch_summary(timer: StepTimer, batch_size: int,
                  device: Optional[Any] = None) -> Dict[str, float]:
    """Epoch wall-time + peak memory, the CUDACallback equivalents."""
    out = {
        "mean_step_s": timer.mean,
        "images_per_sec": timer.throughput(batch_size),
    }
    out.update(device_memory_stats(device))
    return out
