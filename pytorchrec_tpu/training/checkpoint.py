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
