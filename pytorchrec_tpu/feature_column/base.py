"""Feature column base classes.

Capability parity with reference feature_column/FeatureColumn.py:10-26,
CategoricalColumn.py:9-14, DenseColumn.py:9-11: a feature column is a
name-keyed accessor over a batch dict (here dicts of ``jax.Array``/numpy),
plus a small metadata bag.
"""

from __future__ import annotations

from abc import ABC
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp


class FeatureColumn(ABC):
    def __init__(self, feature_name: str):
        self.feature_name = feature_name
        self._info: Dict[str, Any] = {}

    def set_info(self, key: str, value: Any) -> None:
        self._info[key] = value

    def get_info(self, key: str, default: Any = None) -> Any:
        return self._info.get(key, default)

    def get_feature_data(self, batch: Mapping[str, Any]) -> Optional[Any]:
        """Pull this column's array out of a batch dict (None if absent)."""
        return batch.get(self.feature_name)

    def __repr__(self):
        return f"{type(self).__name__}(feature_name={self.feature_name!r})"


class CategoricalColumn(FeatureColumn, ABC):
    """Adds vocab size ``category_num`` (reference CategoricalColumn.py:9-14)."""

    def __init__(self, feature_name: str, category_num: int):
        super().__init__(feature_name)
        self.category_num = int(category_num)

    def __repr__(self):
        return (
            f"{type(self).__name__}(feature_name={self.feature_name!r},"
            f" category_num={self.category_num})"
        )


class DenseColumn(FeatureColumn, ABC):
    """Marker base for dense (float) input columns."""


def as_int(array):
    """Ensure an integer dtype for embedding lookups (torch ``.long()`` analogue)."""
    if array is None:
        return None
    return jnp.asarray(array).astype(jnp.int32)
