"""Profiling / observability helpers.

The reference's only observability is do_bench timing + an analytic FLOPs
model (reference: src/bench.py:99, src/flash_attention_openai_tutorial.py:630-636;
SURVEY.md §5 "tracing/profiling: none beyond benchmarking").  TPU-native
equivalents: jax.profiler traces viewable in XProf/TensorBoard, plus
%-of-speed-of-light reporting against the device's peak numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

# Peak per-chip numbers for %-of-SOL reporting (public spec sheets).
_PEAKS = {
    # device_kind substring: (bf16 TFLOP/s, HBM GB/s)
    "v5 lite": (394.0, 819.0),
    "v5e": (394.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6": (918.0, 1640.0),
}


def device_peaks(device=None):
    """(bf16 TFLOP/s, HBM GB/s) for the current device, or None if unknown."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peaks in _PEAKS.items():
        if sub in kind:
            return peaks
    return None


def percent_of_sol(tflops: float, device=None) -> Optional[float]:
    peaks = device_peaks(device)
    if peaks is None:
        return None
    return 100.0 * tflops / peaks[0]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fa_tpu_trace"):
    """jax.profiler trace context; open the dir with XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the XProf timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling wall-clock timer for steady-state steps (skips warmup)."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
