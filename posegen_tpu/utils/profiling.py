"""Tracing / profiling utilities.

The reference has essentially no profiling (SURVEY §5: an unused
torch.autograd.profiler import, time.time() prints and CUDA peak-memory
logging, run_nerf.py:61,78,607). This module is the cheap large upgrade:
jax profiler traces, phase timers with EMA, and device-memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Named phase timers with exponential moving averages.

    with timer.phase("render"): ...   # blocks on device completion
    """

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Dict[str, float] = {}
        self.last: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.last[name] = dt
            self.count[name] = self.count.get(name, 0) + 1
            prev = self.ema.get(name)
            self.ema[name] = dt if prev is None else (1 - self.alpha) * prev + self.alpha * dt

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v * 1e3:.1f}ms (x{self.count[k]})" for k, v in self.ema.items()
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device memory stats in MB (the TPU analog of the reference's
    torch.cuda.max_memory_allocated logging, run_nerf.py:607)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    mb = 1.0 / (1024 * 1024)
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k.replace("bytes", "mb")] = stats[k] * mb
    return out
