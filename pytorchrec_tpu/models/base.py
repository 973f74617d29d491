"""Model base: functional flax modules with the reference's data contract.

Capability parity with the reference model contract (SURVEY §2.3): every model
takes feature-column objects + hparams at construction and maps a batch dict
to ``(prediction, target)``:

* point-wise rows: ``prediction [B]``, target = label column as float;
* ranking rows (item ids ``[B, sample_n]``, positive first): prediction
  ``[B, sample_n]``, target = one-hot-first (e.g. reference FunkSVD.py:64-65).

Unlike the reference's mutable ``IModel`` (compile/fit live on the module,
model/IModel.py:94-209), models here are pure flax modules — parameters are
pytrees, the trainer owns state, and ``train_step`` is one jitted function
(see pytorchrec_tpu/training/trainer.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Batch = Dict[str, Any]
Prediction = Tuple[jnp.ndarray, Optional[jnp.ndarray]]


def one_hot_first_target(prediction: jnp.ndarray) -> jnp.ndarray:
    """Ranking target: ``[B, N]`` zeros with column 0 = 1 (the positive)."""
    target = jnp.zeros_like(prediction, dtype=jnp.float32)
    return target.at[:, 0].set(1.0)


def label_target(label_column, batch: Batch) -> Optional[jnp.ndarray]:
    target = label_column.get_feature_data(batch) if label_column is not None else None
    if target is not None:
        target = jnp.asarray(target).astype(jnp.float32)
    return target


class RecModel(nn.Module):
    """Base class for all rec models: ``__call__(batch, train) -> (pred, target)``."""

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:  # pragma: no cover
        raise NotImplementedError
