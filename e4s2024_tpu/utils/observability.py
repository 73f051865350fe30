"""Observability: metrics logging, profiling traces, stage timers.

The reference has only tqdm + ad-hoc prints and a rank-0 tensorboardX writer
(reference training/coach.py:221-225; SURVEY.md §5.1/§5.5). This module gives
the framework proper observability:

- `MetricsLogger`: JSONL metrics stream + optional tensorboardX scalars/images,
- `profile_trace`: context manager around `jax.profiler` (view in TensorBoard
  or Perfetto),
- `StageTimer`: wall-clock per-stage timing with device sync.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, metrics: dict[str, Any], prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            rec[f"{prefix}{k}"] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}{k}", float(v), step)

    def log_image(self, step: int, tag: str, img: np.ndarray):
        """img: (H, W, 3) uint8."""
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(img), step, dataformats="HWC")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (XLA ops, HBM, fusion) for TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock timing with device synchronization."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.1f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
