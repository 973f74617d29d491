"""Fixed-shape epoch batch iterators.

TPU-first replacement for the reference's per-epoch
``DataLoader(shuffle, num_workers, drop_last)`` (model/IModel.py:183-187,
219-246): batches are whole-array slices off the columnar reader — no worker
processes, no per-row collation — and every batch has the same static shape so
the jitted step functions compile exactly once.

* train: shuffled permutation, ``drop_last`` (the reference's fit flag).
* eval/predict: sequential; the final ragged batch is padded by repeating the
  last row, and the true row count is yielded alongside so callers trim
  predictions before computing metrics.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from pytorchrec_tpu.data.readers.base import DataReader

Batch = Dict[str, np.ndarray]


def num_train_batches(dataset_size: int, batch_size: int, drop_last: bool = True) -> int:
    if drop_last:
        return dataset_size // batch_size
    return math.ceil(dataset_size / batch_size)


def train_batches(
    reader: DataReader,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Batch]:
    """One shuffled epoch of fixed-shape train batches."""
    size = reader.get_train_dataset_size()
    order = np.arange(size)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    n_batches = num_train_batches(size, batch_size, drop_last)
    for b in range(n_batches):
        indices = order[b * batch_size : (b + 1) * batch_size]
        if len(indices) < batch_size and drop_last:
            break
        yield reader.get_batch("train", indices)


def eval_batches(
    reader: DataReader,
    split: str,
    batch_size: int,
) -> Iterator[Tuple[Batch, int]]:
    """Sequential fixed-shape batches; yields (batch, valid_row_count)."""
    size = reader.get_dataset_size(split)
    for start in range(0, size, batch_size):
        stop = min(start + batch_size, size)
        indices = np.arange(start, stop)
        valid = len(indices)
        if valid < batch_size:
            pad = np.full(batch_size - valid, indices[-1], dtype=indices.dtype)
            indices = np.concatenate([indices, pad])
        yield reader.get_batch(split, indices), valid
