"""Dense / MLP tower modules.

Capability parity with reference model/layer/Dense.py:4-24 and MLP.py:8-23:
Dense = Linear -> activation -> Dropout, MLP = stack of Dense. Unlike the
reference (relu only, "todo other activations"), the activation is pluggable.
XLA fuses the bias+activation into the matmul epilogue on TPU.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pytorchrec_tpu.ops.embedding import normal_init

_ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "identity": lambda x: x,
}


def get_activation(name: str) -> Callable:
    if name not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; available {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[name]


class Dense(nn.Module):
    features: int
    activation: str = "relu"
    dropout: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=normal_init,
            bias_init=normal_init,
        )(x)
        x = get_activation(self.activation)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class MLP(nn.Module):
    hidden_units_list: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for units in self.hidden_units_list:
            x = Dense(units, self.activation, self.dropout)(x, train=train)
        return x
