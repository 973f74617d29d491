"""Integer-id categorical column.

Capability parity with reference
feature_column/CategoricalColumnWithIdentity.py:10-46 — the column type every
model actually consumes. ``from_array`` mirrors ``from_series``: vocab size is
``max + 1`` and min/max are recorded in the metadata bag.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

from pytorchrec_tpu.feature_column.base import CategoricalColumn, as_int

MIN_VALUE = "min_value"
MAX_VALUE = "max_value"


class CategoricalColumnWithIdentity(CategoricalColumn):
    def get_feature_data(self, batch: Mapping[str, Any]) -> Optional[Any]:
        data = batch.get(self.feature_name)
        if data is None:
            return None
        return as_int(data)

    @classmethod
    def from_array(cls, feature_name: str, array) -> "CategoricalColumnWithIdentity":
        array = np.asarray(array)
        column = cls(feature_name=feature_name, category_num=int(array.max()) + 1)
        column.set_info(MIN_VALUE, int(array.min()))
        column.set_info(MAX_VALUE, int(array.max()))
        return column

    # pandas-series convenience, same name as the reference classmethod
    @classmethod
    def from_series(cls, feature_name: str, series) -> "CategoricalColumnWithIdentity":
        return cls.from_array(feature_name, np.asarray(series))
