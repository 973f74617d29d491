"""Training callbacks.

Capability parity with the reference callback layer
(/root/reference/torchrec/callback/): ICallback hook surface
(ICallback.py:8-109), CallbackList fan-out with batch-hook timing
(CallbackList.py:23-229), History best-epoch selection (History.py:26-40),
ModelCheckpoint (ModelCheckpoint.py:50-98), EarlyStopping
(EarlyStopping.py:28-85), CSVLogger (CSVLogger.py:27-65), TerminateOnNaN
(TerminateOnNaN.py:11-20) and the Keras-style ProgbarLogger
(ProgbarLogger.py:15-234, simplified to per-epoch line output — tqdm-style
terminal redraw buys nothing in headless TPU jobs).

Differences by design: callbacks talk to the *trainer* (which owns immutable
train state), not a mutable nn.Module; "weights" are parameter pytrees.
"""

from __future__ import annotations

import collections
import csv
import logging
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

Logs = Dict[str, Any]


class Callback:
    """Hook surface (reference ICallback.py:8-109)."""

    def __init__(self):
        self.trainer = None
        self.params: Dict[str, Any] = {}

    def set_trainer(self, trainer) -> None:
        self.trainer = trainer

    def set_params(self, params: Dict[str, Any]) -> None:
        self.params = params

    def on_epoch_begin(self, epoch: int, logs: Optional[Logs] = None): ...
    def on_epoch_end(self, epoch: int, logs: Optional[Logs] = None): ...
    def on_train_batch_begin(self, batch: int, logs: Optional[Logs] = None): ...
    def on_train_batch_end(self, batch: int, logs: Optional[Logs] = None): ...
    def on_test_batch_begin(self, batch: int, logs: Optional[Logs] = None): ...
    def on_test_batch_end(self, batch: int, logs: Optional[Logs] = None): ...
    def on_predict_batch_begin(self, batch: int, logs: Optional[Logs] = None): ...
    def on_predict_batch_end(self, batch: int, logs: Optional[Logs] = None): ...
    def on_train_begin(self, logs: Optional[Logs] = None): ...
    def on_train_end(self, logs: Optional[Logs] = None): ...
    def on_test_begin(self, logs: Optional[Logs] = None): ...
    def on_test_end(self, logs: Optional[Logs] = None): ...
    def on_predict_begin(self, logs: Optional[Logs] = None): ...
    def on_predict_end(self, logs: Optional[Logs] = None): ...


class History(Callback):
    """Per-epoch log accumulation + best-epoch selection
    (reference History.py:26-40)."""

    def __init__(self):
        super().__init__()
        self.epoch: List[int] = []
        self.history: Dict[str, List[Any]] = {}

    def on_train_begin(self, logs=None):
        self.epoch = []
        self.history = {}

    def on_epoch_end(self, epoch: int, logs=None):
        logs = logs or {}
        self.epoch.append(epoch)
        for key, value in logs.items():
            self.history.setdefault(key, []).append(value)

    def get_best_epoch_logs(self, monitor: str, mode: str = "max"):
        """(best_epoch, logs_at_best) by the monitored metric
        (reference History.py:34-40)."""
        values = self.history[monitor]
        best = int(np.argmax(values) if mode == "max" else np.argmin(values))
        return self.epoch[best], {k: v[best] for k, v in self.history.items()}


class CallbackList:
    """Dispatch + default History injection + batch-hook timing warning
    (reference CallbackList.py:23-229)."""

    def __init__(
        self,
        callbacks: Optional[Sequence[Callback]] = None,
        add_history: bool = False,
        add_progbar: bool = False,
        trainer=None,
        **params,
    ):
        self.callbacks: List[Callback] = list(callbacks or [])
        self.history: Optional[History] = None
        for cb in self.callbacks:
            if isinstance(cb, History):
                self.history = cb
        if add_history and self.history is None:
            self.history = History()
            self.callbacks.append(self.history)
        if add_progbar and not any(isinstance(c, ProgbarLogger) for c in self.callbacks):
            self.callbacks.append(ProgbarLogger())
        if trainer is not None:
            self.set_trainer(trainer)
        if params:
            self.set_params(params)
        self._batch_times = collections.deque(maxlen=20)
        self._hook_times = collections.deque(maxlen=20)
        self._batch_start_time = 0.0
        self._warned_slow = False

    def set_trainer(self, trainer) -> None:
        self.trainer = trainer
        for cb in self.callbacks:
            cb.set_trainer(trainer)

    def set_params(self, params: Dict[str, Any]) -> None:
        self.params = params
        for cb in self.callbacks:
            cb.set_params(params)

    def append(self, callback: Callback) -> None:
        self.callbacks.append(callback)

    def implements_train_batch_hooks(self) -> bool:
        """True when any callback overrides a train-batch hook (reference
        ICallback's ``implements_*_batch_hooks`` introspection,
        ICallback.py:86-109) — lets the trainer skip the per-batch
        device->host loss sync when nobody is listening."""
        return any(
            type(cb).on_train_batch_begin is not Callback.on_train_batch_begin
            or type(cb).on_train_batch_end is not Callback.on_train_batch_end
            for cb in self.callbacks
        )

    def _call(self, hook: str, *args) -> None:
        for cb in self.callbacks:
            getattr(cb, hook)(*args)

    # epoch / train / test / predict hooks -----------------------------------
    def on_epoch_begin(self, epoch: int, logs: Optional[Logs] = None):
        self._call("on_epoch_begin", epoch, logs)

    def on_epoch_end(self, epoch: int, logs: Optional[Logs] = None):
        self._call("on_epoch_end", epoch, logs)

    def on_train_begin(self, logs: Optional[Logs] = None):
        self._call("on_train_begin", logs)

    def on_train_end(self, logs: Optional[Logs] = None):
        self._call("on_train_end", logs)

    def on_test_begin(self, logs: Optional[Logs] = None):
        self._call("on_test_begin", logs)

    def on_test_end(self, logs: Optional[Logs] = None):
        self._call("on_test_end", logs)

    def on_predict_begin(self, logs: Optional[Logs] = None):
        self._call("on_predict_begin", logs)

    def on_predict_end(self, logs: Optional[Logs] = None):
        self._call("on_predict_end", logs)

    # batch hooks with timing (reference CallbackList.py:103-127) -------------
    def on_train_batch_begin(self, batch: int, logs: Optional[Logs] = None):
        self._batch_start_time = time.monotonic()
        self._call("on_train_batch_begin", batch, logs)

    def on_train_batch_end(self, batch: int, logs: Optional[Logs] = None):
        batch_time = time.monotonic() - self._batch_start_time
        start = time.monotonic()
        self._call("on_train_batch_end", batch, logs)
        hook_time = time.monotonic() - start
        self._batch_times.append(batch_time)
        self._hook_times.append(hook_time)
        if (
            not self._warned_slow
            and len(self._batch_times) == self._batch_times.maxlen
            and sum(self._hook_times) > 0.95 * sum(self._batch_times)
            and sum(self._batch_times) > 0
        ):
            self._warned_slow = True
            logger.warning(
                "callbacks are consuming >95%% of batch time "
                "(batch %.4fs vs hooks %.4fs)",
                np.mean(self._batch_times), np.mean(self._hook_times),
            )

    def on_test_batch_begin(self, batch: int, logs: Optional[Logs] = None):
        self._call("on_test_batch_begin", batch, logs)

    def on_test_batch_end(self, batch: int, logs: Optional[Logs] = None):
        self._call("on_test_batch_end", batch, logs)

    def on_predict_batch_begin(self, batch: int, logs: Optional[Logs] = None):
        self._call("on_predict_batch_begin", batch, logs)

    def on_predict_batch_end(self, batch: int, logs: Optional[Logs] = None):
        self._call("on_predict_batch_end", batch, logs)


class ProgbarLogger(Callback):
    """Per-epoch progress line (reference ProgbarLogger.py:15-234 simplified:
    verbose terminal redraw is useless in headless TPU jobs; one line per
    epoch with timing + logs)."""

    def __init__(self, print_fn=None):
        super().__init__()
        self.print_fn = print_fn or (lambda s: logger.info("%s", s))
        self._epoch_start = 0.0

    def on_epoch_begin(self, epoch: int, logs=None):
        self._epoch_start = time.monotonic()

    def on_epoch_end(self, epoch: int, logs=None):
        elapsed = time.monotonic() - self._epoch_start
        epochs = self.params.get("epochs", "?")
        parts = " - ".join(f"{k}: {self._fmt(v)}" for k, v in (logs or {}).items())
        self.print_fn(f"Epoch {epoch + 1}/{epochs} - {elapsed:.1f}s - {parts}")

    @staticmethod
    def _fmt(value) -> str:
        try:
            return f"{float(value):.4f}"
        except (TypeError, ValueError):
            return str(value)


class ModelCheckpoint(Callback):
    """Save weights each epoch (or every N batches), optionally best-only on a
    monitored metric; also triggers the trainer's in-RAM best-weights copy
    (reference ModelCheckpoint.py:50-98)."""

    def __init__(
        self,
        filepath: str,
        monitor: str = "loss",
        mode: str = "min",
        save_best_only: bool = True,
        save_freq: str = "epoch",  # "epoch" or int (batches)
    ):
        super().__init__()
        self.filepath = filepath
        self.monitor = monitor
        self.mode = mode
        self.save_best_only = save_best_only
        self.save_freq = save_freq
        self.best = -np.inf if mode == "max" else np.inf
        self._batches_seen = 0

    def _improved(self, current) -> bool:
        if self.mode == "max":
            return current > self.best
        return current < self.best

    def _save(self, logs: Optional[Logs]) -> None:
        logs = logs or {}
        if self.save_best_only:
            current = logs.get(self.monitor)
            if current is None:
                return
            if not self._improved(current):
                return
            self.best = current
            self.trainer.save_best_weights()
        os.makedirs(os.path.dirname(self.filepath) or ".", exist_ok=True)
        self.trainer.save_weights(self.filepath)

    def on_epoch_end(self, epoch: int, logs=None):
        if self.save_freq == "epoch":
            self._save(logs)

    def on_train_batch_end(self, batch: int, logs=None):
        if isinstance(self.save_freq, int):
            self._batches_seen += 1
            if self._batches_seen % self.save_freq == 0:
                self._save(logs)


class EarlyStopping(Callback):
    """Patience/min_delta/baseline monitor; sets ``trainer.stop_training``
    (reference EarlyStopping.py:28-85)."""

    def __init__(
        self,
        monitor: str = "loss",
        mode: str = "min",
        patience: int = 0,
        min_delta: float = 0.0,
        baseline: Optional[float] = None,
        restore_best_weights: bool = False,
    ):
        super().__init__()
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_delta = abs(min_delta)
        self.baseline = baseline
        self.restore_best_weights = restore_best_weights
        self.wait = 0
        self.stopped_epoch = 0
        self.best = -np.inf if mode == "max" else np.inf

    def _improved(self, current) -> bool:
        if self.mode == "max":
            return current > self.best + self.min_delta
        return current < self.best - self.min_delta

    def on_train_begin(self, logs=None):
        self.wait = 0
        self.stopped_epoch = 0
        self.best = -np.inf if self.mode == "max" else np.inf
        if self.baseline is not None:
            self.best = self.baseline

    def on_epoch_end(self, epoch: int, logs=None):
        current = (logs or {}).get(self.monitor)
        if current is None:
            return
        if self._improved(current):
            self.best = current
            self.wait = 0
            return
        self.wait += 1
        if self.wait >= self.patience:
            self.stopped_epoch = epoch
            self.trainer.stop_training = True
            if self.restore_best_weights:
                self.trainer.load_best_weights()

    def on_train_end(self, logs=None):
        if self.stopped_epoch > 0:
            logger.info("early stopping at epoch %d", self.stopped_epoch + 1)


class CSVLogger(Callback):
    """Per-epoch TSV append with flush; NA-fills remaining epochs on early
    stop (reference CSVLogger.py:27-65)."""

    def __init__(self, filename: str, sep: str = "\t", append: bool = False):
        super().__init__()
        self.filename = filename
        self.sep = sep
        self.append = append
        self.keys: Optional[List[str]] = None
        self.writer = None
        self.file = None
        self._epochs_written = 0

    def on_train_begin(self, logs=None):
        os.makedirs(os.path.dirname(self.filename) or ".", exist_ok=True)
        self.file = open(self.filename, "a" if self.append else "w", newline="")
        self.writer = None
        self._epochs_written = 0

    def on_epoch_end(self, epoch: int, logs=None):
        logs = dict(logs or {})
        if self.writer is None:
            self.keys = ["epoch"] + sorted(logs.keys())
            self.writer = csv.DictWriter(self.file, fieldnames=self.keys, delimiter=self.sep)
            self.writer.writeheader()
        row = {"epoch": epoch}
        for key in self.keys[1:]:
            value = logs.get(key, "NA")
            row[key] = float(value) if isinstance(value, (int, float, np.floating)) else value
        self.writer.writerow(row)
        self.file.flush()
        self._epochs_written += 1

    def on_train_end(self, logs=None):
        # NA-fill remaining epochs if stopped early (reference CSVLogger.py:42-44)
        total = self.params.get("epochs")
        if self.writer is not None and total is not None:
            for epoch in range(self._epochs_written, total):
                self.writer.writerow(
                    {"epoch": epoch, **{k: "NA" for k in self.keys[1:]}}
                )
        if self.file is not None:
            self.file.close()
            self.file = None


class TerminateOnNaN(Callback):
    """Stop on nan/inf loss (reference TerminateOnNaN.py:11-20)."""

    def on_train_batch_end(self, batch: int, logs=None):
        loss = (logs or {}).get("loss")
        if loss is not None and not np.isfinite(loss):
            logger.warning("batch %d: invalid loss %s, terminating training", batch, loss)
            self.trainer.stop_training = True
