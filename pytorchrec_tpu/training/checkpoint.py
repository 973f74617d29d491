"""Orbax checkpoint manager: atomic, async, sharding-aware train-state
checkpoints with retention + auto-resume.

The reference has weights-only torch.save and no true resume (SURVEY §5.4:
no optimizer/RNG/epoch state). This manager checkpoints the FULL train state
(params + optimizer moments + step + PRNG key — the RL variant's
target_params ride along automatically as part of the pytree), writes
atomically (rename-on-complete), saves asynchronously so training never
blocks on IO, and restores sharded: on a mesh, each leaf materializes
directly in its NamedSharding layout.

Also provides ``CheckpointCallback`` for periodic in-training saves and
preemption-safe resume (the TPU-idiomatic answer to elastic recovery,
SURVEY §5.3).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pytorchrec_tpu.training.callbacks import Callback

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager``."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        import os

        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        # orbax/tensorstore requires absolute paths
        self.manager = ocp.CheckpointManager(os.path.abspath(directory), options=options)

    def save(self, step: int, state) -> None:
        """Async, atomic save of a train-state pytree."""
        self.manager.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the template's structure + shardings.

        ``state_template`` is a live train state (as built by
        ``Trainer.init_state``) — each restored leaf adopts the template
        leaf's sharding, so sharded tables land sharded.
        """
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        abstract = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype,
                sharding=getattr(leaf, "sharding", None),
            )
            if hasattr(leaf, "shape") else leaf,
            state_template,
        )
        return self.manager.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


class CheckpointCallback(Callback):
    """Periodic full-state checkpointing during fit; resume picks up where
    the last durable save left off."""

    def __init__(self, directory: str, every_epochs: int = 1, max_to_keep: int = 3):
        super().__init__()
        self.ckpt = CheckpointManager(directory, max_to_keep=max_to_keep)
        self.every_epochs = every_epochs

    def on_epoch_end(self, epoch: int, logs=None):
        if (epoch + 1) % self.every_epochs == 0:
            self.ckpt.save(int(self.trainer.state.step), self.trainer.state)

    def on_train_end(self, logs=None):
        self.ckpt.wait()

    def maybe_resume(self) -> Optional[int]:
        """Restore the trainer's state from the latest checkpoint, if any.
        Returns the restored step (or None). Call after ``init_state``."""
        step = self.ckpt.latest_step()
        if step is None:
            return None
        self.trainer.state = self.ckpt.restore(self.trainer.state, step)
        logger.info("resumed from checkpoint step %d", step)
        return step


class PreemptionGuard(CheckpointCallback):
    """Preemption-safe training (FUTURE item 8; no reference counterpart —
    the reference's torch.save path loses optimizer/step state entirely).

    Installs a handler for ``signals`` (default SIGTERM — what TPU pod
    maintenance / spot reclamation delivers) while ``fit`` runs. On receipt
    it does NOT interrupt the in-flight jitted step; at the next batch (or
    epoch) boundary it saves the FULL train state synchronously and stops
    the loop, so a restart with ``maybe_resume`` continues exactly where
    the preempted run left off. The handler window is scoped to training:
    previous handlers are restored on ``on_train_end``.

    Multi-host runs: the orbax save is a COLLECTIVE, so every process must
    stop at the SAME step even when only one host receives the signal.
    Every ``sync_every`` batches (and at each epoch end) all processes
    all-reduce their local preempted flags and act only on the consensus —
    a host-synchronized tiny collective, amortized across the window.
    Cross-mesh elasticity: the saved state restores onto a DIFFERENT device
    count / mesh layout (``maybe_resume`` reshards into the new trainer's
    sharding template — see scripts/elastic_sim.py for the 2-process ->
    4-process resize drill).
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 every_epochs: int = 0, signals=None, sync_every: int = 10):
        # every_epochs=0: save only on preemption (pass >0 for periodic too)
        import signal as _signal

        super().__init__(directory, every_epochs=every_epochs or 10**9,
                         max_to_keep=max_to_keep)
        self.signals = tuple(signals) if signals else (_signal.SIGTERM,)
        self.sync_every = sync_every
        self.preempted = False
        self._previous = {}
        self._batches_seen = 0

    def on_train_begin(self, logs=None):
        import signal as _signal

        self.preempted = False
        self._batches_seen = 0
        for sig in self.signals:
            self._previous[sig] = _signal.signal(sig, self._on_signal)

    def _on_signal(self, signum, frame):
        logger.warning("preemption signal %d received; will checkpoint and "
                       "stop at the next step boundary", signum)
        self.preempted = True

    def _consensus_preempted(self) -> bool:
        """Any-process preemption flag. Collective when multi-host — every
        process must reach this call the same number of times."""
        import jax as _jax

        if _jax.process_count() <= 1:
            return self.preempted
        import numpy as _np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            _np.asarray(int(self.preempted))
        )
        return bool(_np.asarray(flags).any())

    def _save_and_stop(self):
        self.ckpt.save(int(self.trainer.state.step), self.trainer.state)
        self.ckpt.wait()  # durable BEFORE the process can be killed
        self.trainer.stop_training = True
        logger.warning("preemption checkpoint saved at step %d",
                       int(self.trainer.state.step))

    def on_train_batch_end(self, batch: int, logs=None):
        if self.trainer.stop_training:
            return
        self._batches_seen += 1
        import jax as _jax

        if _jax.process_count() > 1:
            # act only at sync points so all hosts stop at the same step
            if self._batches_seen % self.sync_every == 0 and self._consensus_preempted():
                self._save_and_stop()
        elif self.preempted:
            self._save_and_stop()

    def on_epoch_end(self, epoch: int, logs=None):
        super().on_epoch_end(epoch, logs)
        if not self.trainer.stop_training and self._consensus_preempted():
            self._save_and_stop()

    def on_train_end(self, logs=None):
        import signal as _signal

        super().on_train_end(logs)
        for sig, previous in self._previous.items():
            _signal.signal(sig, previous)
        self._previous = {}
