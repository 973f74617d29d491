"""Jester joke-rating formatter.

Capability parity with reference proprecess/jester.py:30-124: tab-tab
separated (uid, iid, rate) triples, synthetic time = row index, binary label
via ``rate_to_label`` on the float rating (reference maps then ``int()``s the
rate).
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import numpy as np
import pandas as pd

from pytorchrec_tpu.data.process.datasets.movielens import _save_canonical
from pytorchrec_tpu.data.schema import DatasetDescription, FeatureMeta
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)


def format_jester(
    dataset_name: str = "Jester-PN",
    raw_name: str = "jester_ratings.dat",
    rate_to_label: Callable = None,
    info: str = "Jester, rate>0 positive",
) -> str:
    rate_to_label = rate_to_label or (lambda x: 1 if x > 0 else 0)
    raw_path = os.path.join(C.raw_data_dir(), raw_name)
    description = DatasetDescription(info=info)

    interaction_df = pd.read_csv(raw_path, sep=r"\t\t", header=None, engine="python")
    interaction_df.columns = [C.UID, C.IID, C.RATE]
    interaction_df[C.LABEL] = interaction_df[C.RATE].map(rate_to_label)
    interaction_df[C.RATE] = interaction_df[C.RATE].map(int)
    interaction_df[C.TIME] = np.arange(len(interaction_df), dtype=np.int32)
    interaction_df = interaction_df.astype(np.int32)
    assert not interaction_df.isnull().any().any()
    interaction_df = interaction_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    interaction_df = interaction_df.reset_index(drop=True)

    user_df = interaction_df[[C.UID]].drop_duplicates().sort_values(
        C.UID, kind="mergesort").reset_index(drop=True)
    item_df = interaction_df[[C.IID]].drop_duplicates().sort_values(
        C.IID, kind="mergesort").reset_index(drop=True)
    description.base_features = [
        FeatureMeta(name, C.CATEGORICAL_COLUMN)
        for name in (C.UID, C.IID, C.RATE, C.LABEL, C.TIME)
    ]
    return _save_canonical(dataset_name, interaction_df, interaction_df,
                           item_df, user_df, description)
