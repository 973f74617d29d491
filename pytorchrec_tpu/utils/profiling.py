"""Profiling / tracing utilities.

The build-side upgrade of the reference's tracing story (SURVEY §5.1: a
wall-clock ``Timer`` and callback-latency warnings only): ``jax.profiler``
trace capture wired into the callback system, plus a step-time tracker with
steady-state statistics (excludes compile-dominated warmup steps).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np

from pytorchrec_tpu.training.callbacks import Callback

logger = logging.getLogger(__name__)


class StepTimer(Callback):
    """Per-batch step timing with steady-state stats.

    ``skip_first`` batches are excluded (XLA compile + input warmup —
    BASELINE.md measurement protocol).
    """

    def __init__(self, batch_size: Optional[int] = None, skip_first: int = 3):
        super().__init__()
        self.batch_size = batch_size
        self.skip_first = skip_first
        self.times: List[float] = []
        self._seen = 0
        self._start = 0.0

    def on_train_batch_begin(self, batch: int, logs=None):
        self._start = time.perf_counter()

    def on_train_batch_end(self, batch: int, logs=None):
        elapsed = time.perf_counter() - self._start
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(elapsed)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        times = np.asarray(self.times)
        out = {
            "steps": int(len(times)),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p99_s": float(np.percentile(times, 99)),
        }
        if self.batch_size:
            out["examples_per_sec"] = float(self.batch_size / times.mean())
        return out

    def on_train_end(self, logs=None):
        if self.times:
            logger.info("step timing: %s", self.stats())


class JaxProfiler(Callback):
    """Capture a ``jax.profiler`` trace for a window of training batches.

    Writes a TensorBoard-loadable trace (xplane) under ``log_dir``; view with
    ``tensorboard --logdir`` or xprof. Default window: batches
    [start_batch, start_batch + num_batches).
    """

    def __init__(self, log_dir: str, start_batch: int = 10, num_batches: int = 5):
        super().__init__()
        self.log_dir = log_dir
        self.start_batch = start_batch
        self.stop_batch = start_batch + num_batches
        self._active = False
        self._seen = 0

    def on_train_batch_begin(self, batch: int, logs=None):
        if self._seen == self.start_batch and not self._active:
            import jax

            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logger.info("jax profiler trace started -> %s", self.log_dir)

    def on_train_batch_end(self, batch: int, logs=None):
        self._seen += 1
        if self._seen == self.stop_batch and self._active:
            self._stop()

    def on_train_end(self, logs=None):
        if self._active:
            self._stop()

    def _stop(self):
        import jax

        jax.profiler.stop_trace()
        self._active = False
        logger.info("jax profiler trace written to %s", self.log_dir)


def enable_nan_debugging() -> None:
    """Turn on ``jax.debug_nans`` (SURVEY §5.2 build note): any nan produced
    under jit raises immediately with the offending primitive."""
    import jax

    jax.config.update("jax_debug_nans", True)


def disable_nan_debugging() -> None:
    import jax

    jax.config.update("jax_debug_nans", False)
