"""Train state pytrees.

The TPU-native replacement for the reference's mutable module state
(model/IModel.py:94-125: optimizer/loss live on the nn.Module): all mutable
training state is one immutable pytree threaded through a jitted
``train_step(state, batch) -> (state, logs)``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: optax.OptState
    step: jax.Array
    rng: jax.Array


@flax.struct.dataclass
class RLTrainState(TrainState):
    """Twin-network state for the value-RL family: ``target_params`` mirrors
    the reference's twin ``IQNet`` state-dict copy (IValueRLModel.py:67-72).
    The periodic target sync is a pure pytree swap inside the train loop."""

    target_params: Optional[Any] = None
