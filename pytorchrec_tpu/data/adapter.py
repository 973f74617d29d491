"""Dataset adapters: reference-API shims over the columnar readers.

Capability parity with reference data/adapter/{TrainDataset,DevDataset,
TestDataset}.py (thin ``torch.utils.data.Dataset`` wrappers, SURVEY §2.5).
The TPU-native pipeline serves whole batches (data/loader.py), so these exist
for API familiarity and for exporting per-row dicts — they are NOT the hot
path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from pytorchrec_tpu.data.readers.base import DataReader


class _SplitDataset:
    split: str = ""

    def __init__(self, data_reader: DataReader):
        self.data_reader = data_reader

    def __len__(self) -> int:
        return self.data_reader.get_dataset_size(self.split)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self.data_reader._squeeze(
            self.data_reader.get_batch(self.split, np.array([index]))
        )


class TrainDataset(_SplitDataset):
    split = "train"

    def train_neg_sample(self) -> None:
        """Proxy (reference adapter/TrainDataset.py)."""
        self.data_reader.train_neg_sample()


class DevDataset(_SplitDataset):
    split = "dev"


class TestDataset(_SplitDataset):
    split = "test"
