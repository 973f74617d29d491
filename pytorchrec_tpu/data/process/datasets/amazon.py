"""Amazon review-JSON formatters (Beauty / Cellphones / Grocery / any).

Capability parity with reference proprecess/amazon_beauty.py,
amazon_cellphones.py, amazon_grocery.py (142 LoC each, identical modulo the
raw filename): stream the 5-core review JSON, int-map reviewerID/asin, 5-star
rate -> binary label, sort by (uid, time).

Divergence by design: ids map 1-based (reference uses the 0-based default of
``get_int_map``, amazon_beauty.py:52-53, which collides with the framework's
``iid 0 = PAD`` convention and silently mis-joins item features through
``iloc[iid - 1]``). The PAD convention is preserved here instead.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Union

import numpy as np
import pandas as pd

from pytorchrec_tpu.data.process.datasets.movielens import _apply_label, _save_canonical
from pytorchrec_tpu.data.process.features import get_int_map
from pytorchrec_tpu.data.schema import DatasetDescription, FeatureMeta
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)


def format_amazon(
    dataset_name: str,
    raw_json_name: str,
    rate_to_label: Union[Dict, None] = None,
    info: str = "Amazon 5-core reviews, rate>=4 positive",
) -> str:
    rate_to_label = rate_to_label or {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    raw_path = os.path.join(C.raw_data_dir(), raw_json_name)
    description = DatasetDescription(info=info)

    uids, iids, rates, times = [], [], [], []
    with open(raw_path) as f:
        for line in f:
            row = json.loads(line)
            uids.append(row["reviewerID"])
            iids.append(row["asin"])
            rates.append(int(row["overall"]))
            times.append(row["unixReviewTime"])

    interaction_df = pd.DataFrame({C.UID: uids, C.IID: iids, C.RATE: rates, C.TIME: times})
    assert not interaction_df.isnull().any().any()
    interaction_df[C.UID] = interaction_df[C.UID].map(
        get_int_map(interaction_df[C.UID], start=1)).astype(np.int32)
    interaction_df[C.IID] = interaction_df[C.IID].map(
        get_int_map(interaction_df[C.IID], start=1)).astype(np.int32)
    interaction_df[C.RATE] = interaction_df[C.RATE].astype(np.int32)
    _apply_label(interaction_df, rate_to_label)
    interaction_df[C.TIME] = interaction_df[C.TIME].astype(np.int32)
    interaction_df = interaction_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    interaction_df = interaction_df.sort_values(
        by=[C.UID, C.TIME], kind="mergesort").reset_index(drop=True)

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


def format_amazon_beauty(dataset_name: str = "Amazon-Beauty-PN", **kwargs) -> str:
    return format_amazon(dataset_name, "reviews_Beauty_5.json", **kwargs)


def format_amazon_cellphones(dataset_name: str = "Amazon-Cellphones-PN", **kwargs) -> str:
    return format_amazon(dataset_name, "reviews_Cell_Phones_and_Accessories_5.json", **kwargs)


def format_amazon_grocery(dataset_name: str = "Amazon-Grocery-PN", **kwargs) -> str:
    return format_amazon(dataset_name, "reviews_Grocery_and_Gourmet_Food_5.json", **kwargs)
