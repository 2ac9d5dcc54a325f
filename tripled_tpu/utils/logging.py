"""Metric logging & profiling (replaces mmcv LogBuffer + TextLoggerHook +
TensorboardLoggerHook, SURVEY §5).

- `MetricLogger` writes an append-only JSONL stream + a human TSV into the
  work dir, and mirrors scalars to TensorBoard when a writer backend is
  available (flax's metric_writers or tensorboardX; both optional).
- `profile_trace` wraps `jax.profiler.trace` so any training window can be
  captured for xprof/perfetto — the tracing subsystem the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Mapping


class MetricLogger:
    def __init__(self, work_dir: str, filename: str = "metrics"):
        os.makedirs(work_dir, exist_ok=True)
        self._jsonl = open(os.path.join(work_dir, f"{filename}.jsonl"), "a")
        self._tb = None
        # flax's SummaryWriter imports TensorFlow — a heavy dependency to
        # drag into every run, so TensorBoard mirroring is opt-in.
        if os.environ.get("TRIPLED_TENSORBOARD", "0") == "1":
            try:
                from flax.metrics import tensorboard  # optional

                self._tb = tensorboard.SummaryWriter(
                    os.path.join(work_dir, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Mapping[str, float], prefix: str = ""):
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                row[key] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k in ("step", "time"):
                    continue
                self._tb.scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a JAX profiler trace (view with xprof / tensorboard)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock imgs/sec meter with warmup skip (the reference only ever
    measured eval FPS — `eval_hooks.py:214-217`)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = -warmup
        self.t0 = None
        self.imgs = 0

    def tick(self, batch_imgs: int):
        self.count += 1
        if self.count == 1:
            self.t0 = time.perf_counter()
            self.imgs = 0
        if self.count >= 1:
            self.imgs += batch_imgs

    @property
    def imgs_per_sec(self) -> float:
        if not self.t0 or self.count < 2:
            return 0.0
        return self.imgs / (time.perf_counter() - self.t0)
