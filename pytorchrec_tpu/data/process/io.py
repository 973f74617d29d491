"""Shared IO helpers for the offline preprocessing pipeline."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pytorchrec_tpu.utils import constants as C


def dataset_path(dataset_name: str, *parts: str) -> str:
    return os.path.join(C.dataset_dir(), dataset_name, *parts)


def read_interactions(dataset_name: str, with_features: bool = False) -> pd.DataFrame:
    name = C.INTERACTION_FEATHER if with_features else C.BASE_INTERACTION_FEATHER
    return pd.read_feather(dataset_path(dataset_name, name))


def read_items(dataset_name: str) -> pd.DataFrame:
    return pd.read_feather(dataset_path(dataset_name, C.ITEM_FEATHER))


def save_index_array(directory: str, npy_name: str, array: np.ndarray) -> None:
    """Write the split-index artifact as ``.npy`` plus a human-readable
    ``.csv`` twin, matching the reference's dual format (tab-separated ints;
    sequential_split.py:85-88, leave_k_out_split.py:89-91)."""
    assert array.dtype == np.int32, array.dtype
    os.makedirs(directory, exist_ok=True)
    np.save(os.path.join(directory, npy_name), array)
    assert npy_name.endswith(".npy"), npy_name
    csv_name = npy_name[: -len(".npy")] + ".csv"
    np.savetxt(os.path.join(directory, csv_name), array, delimiter="\t",
               fmt="%d")
