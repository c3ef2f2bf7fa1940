"""Profiling, step timing, and MD observability.

The reference measures performance with bare wall-clock loops
(BenchmarkCudaANISymmetryFunctions.cu:154-161, BenchmarkTorchANISymmetry
Functions.py:24-35) and has no tracing or metrics (SURVEY §5). Here:

* :class:`StepTimer` — steady-state wall-clock timing with warmup and
  ``block_until_ready`` fencing (async dispatch makes naive timing wrong).
* :func:`trace` — context manager around ``jax.profiler`` emitting an XLA
  trace viewable in TensorBoard/Perfetto.
* :class:`EnergyDriftMonitor` — the MD-loop health counter: tracks total
  energy drift per picosecond against a tolerance.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, List, Optional

import jax
import numpy as np


class StepTimer:
    """Measure steady-state per-call latency of a jitted function."""

    def __init__(self, fn: Callable, warmup: int = 3):
        self.fn = fn
        self.warmup = warmup

    def measure(self, *args, iters: int = 20) -> dict:
        out = None
        for _ in range(self.warmup):
            out = self.fn(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = self.fn(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)
        return {
            'mean_us': float(times.mean() * 1e6),
            'median_us': float(np.median(times) * 1e6),
            'p10_us': float(np.percentile(times, 10) * 1e6),
            'p90_us': float(np.percentile(times, 90) * 1e6),
            'iters': iters,
        }


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/nnpops_tpu_trace'):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class EnergyDriftMonitor:
    """Track total-energy drift of an MD trajectory.

    Feed (time_ps, total_energy) samples; ``drift_per_ps`` is the linear-fit
    slope, the standard MD health metric. ``check`` raises if the drift
    exceeds a tolerance — the framework's failure-detection hook for long
    runs (SURVEY §5 'Metrics/observability').
    """

    def __init__(self, tolerance_per_ps: Optional[float] = None):
        self.times: List[float] = []
        self.energies: List[float] = []
        self.tolerance = tolerance_per_ps

    def record(self, time_ps: float, total_energy: float) -> None:
        if not np.isfinite(total_energy):
            raise RuntimeError(
                f'non-finite total energy at t={time_ps} ps: {total_energy}')
        self.times.append(float(time_ps))
        self.energies.append(float(total_energy))

    @property
    def drift_per_ps(self) -> float:
        if len(self.times) < 2:
            return 0.0
        slope, _ = np.polyfit(self.times, self.energies, 1)
        return float(slope)

    def check(self) -> None:
        if self.tolerance is not None and abs(self.drift_per_ps) > self.tolerance:
            raise RuntimeError(
                f'energy drift {self.drift_per_ps:.3g}/ps exceeds tolerance '
                f'{self.tolerance:.3g}/ps')
