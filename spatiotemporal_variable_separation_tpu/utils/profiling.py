"""Profiling / observability utilities.

The reference has none (a tqdm bar only, SURVEY.md §5.1); these are the
TPU-native equivalents: ``jax.profiler`` trace capture around training
steps (inspect with TensorBoard or xprof) and a CSV metrics logger."""

from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append per-step scalars to ``<xp_dir>/metrics.csv``."""

    def __init__(self, xp_dir: str, filename: str = "metrics.csv"):
        self.path = os.path.join(xp_dir, filename)
        self._file = None
        self._writer = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None:
            exists = os.path.exists(self.path)
            fields = list(dict.fromkeys(list(row) + ["samples_per_sec"]))
            self._file = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=fields,
                                          restval="", extrasaction="ignore")
            if not exists:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._file.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
            self._writer = None


class StepTimer:
    """Rolling per-step wall-clock statistics (samples/sec)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._last = time.perf_counter()
        self.steps = 0
        self.elapsed = 0.0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.steps += 1
        self.elapsed += dt
        return dt

    @property
    def samples_per_sec(self) -> float:
        return self.steps * self.batch_size / self.elapsed if self.elapsed else 0.0
