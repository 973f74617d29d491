"""Pytree helpers: the host<->device marshaling layer.

Capability parity with reference utils/data_structure.py:10-52, rebuilt on
``jax.tree_util`` instead of hand-rolled recursion.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def map_structure(fn: Callable[[Any], Any], structure: Any) -> Any:
    """Apply ``fn`` to every leaf of a nested list/dict/tuple structure."""
    return jax.tree_util.tree_map(fn, structure)


def to_numpy(structure: Any) -> Any:
    """Device arrays -> host numpy; python scalars pass through."""

    def _leaf(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(_leaf, structure)


def to_python_scalars(structure: Any) -> Any:
    """Like reference ``tensor_to_numpy_or_python_type``: 0-d arrays -> python scalars."""

    def _leaf(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            arr = np.asarray(x)
            return arr.item() if arr.ndim == 0 else arr
        return x

    return jax.tree_util.tree_map(_leaf, structure)


def to_device(structure: Any, sharding=None) -> Any:
    """Host batch -> device, optionally with an explicit sharding layout."""
    if sharding is None:
        return jax.device_put(structure)
    return jax.device_put(structure, sharding)
