"""XING RecSys-Challenge-2017 formatter.

Capability parity with reference proprecess/xing.py:35-350:

* ``prepare_user_data`` — anonymized career features, country int-map,
  int8 downcast, sorted by uid;
* ``prepare_item_data`` — career features + lat/long 10-degree buckets
  (NaN -> 0) + created-at month index from the minimum year;
* ``prepare_interaction_data`` — sort by (uid, label), dedup (uid, iid)
  keep-last (keeps each pair's strongest interaction), re-sort by
  (uid, time), interaction-type -> rate via the challenge scoring map
  {0:0, 1:1, 2:5, 3:5, 4:-10, 5:20} and -> binary label
  {0:0, 1:1, 2:1, 3:1, 4:0, 5:1};
* ``format_data`` — warm-user filter (>=1 positive), uid/iid remap to
  contiguous 1-based ids over the interaction∩features sets, merge, save.

Vectorized throughout (drop_duplicates/searchsorted instead of row maps).
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd

from pytorchrec_tpu.data.process.datasets.movielens import _save_canonical
from pytorchrec_tpu.data.process.features import get_int_map
from pytorchrec_tpu.data.schema import DatasetDescription, FeatureMeta
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)

COUNTRY_INT_MAP = {"non_dach": 0, "de": 1, "at": 2, "ch": 3}
LABEL_TO_RATE = {0: 0, 1: 1, 2: 5, 3: 5, 4: -10, 5: 20}
LABEL_TO_LABEL = {0: 0, 1: 1, 2: 1, 3: 1, 4: 0, 5: 1}

USER_FEATURES = [
    "u_c_career_level", "u_c_discipline_id", "u_c_industry_id", "u_c_country",
    "u_c_region", "u_c_experience_n_entries_class",
    "u_c_experience_years_experience", "u_c_experience_years_in_current",
    "u_c_edu_degree", "u_c_wtcj", "u_c_premium",
]
ITEM_FEATURES = [
    "i_c_career_level", "i_c_discipline_id", "i_c_industry_id", "i_c_country",
    "i_c_is_paid", "i_c_region", "i_c_latitude", "i_c_longitude",
    "i_c_employment", "i_c_created_at",
]


def prepare_user_data(raw_name: str = "XING", users_csv: str = "users.csv") -> pd.DataFrame:
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    user_df = pd.read_csv(os.path.join(raw_dir, users_csv), sep="\t")
    user_df.columns = [C.UID, "jobroles"] + USER_FEATURES[:3] + [
        "u_c_country", "u_c_region", "u_c_experience_n_entries_class",
        "u_c_experience_years_experience", "u_c_experience_years_in_current",
        "u_c_edu_degree", "edu_fieldofstudies", "u_c_wtcj", "u_c_premium",
    ]
    user_df = user_df.drop(columns=["jobroles", "edu_fieldofstudies"])
    assert not user_df.isnull().any().any()
    user_df["u_c_country"] = user_df["u_c_country"].map(COUNTRY_INT_MAP)
    user_df[C.UID] = user_df[C.UID].astype(np.int32)
    for feature in USER_FEATURES:
        user_df[feature] = user_df[feature].astype(np.int8)
    user_df = user_df.sort_values(C.UID, kind="mergesort").reset_index(drop=True)
    user_df.to_feather(os.path.join(raw_dir, "pre_user.feather"))
    return user_df


def prepare_item_data(raw_name: str = "XING", items_csv: str = "items.csv") -> pd.DataFrame:
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    item_df = pd.read_csv(os.path.join(raw_dir, items_csv), sep="\t")
    item_df.columns = [
        C.IID, "title", "i_c_career_level", "i_c_discipline_id",
        "i_c_industry_id", "i_c_country", "i_c_is_paid", "i_c_region",
        "i_c_latitude", "i_c_longitude", "i_c_employment", "tags",
        "i_c_created_at",
    ]
    item_df = item_df.drop(columns=["title", "tags"])
    item_df["i_c_country"] = item_df["i_c_country"].map(COUNTRY_INT_MAP)

    # 10-degree geo buckets, NaN -> 0 (xing.py:97-100)
    lat = item_df["i_c_latitude"].to_numpy(dtype=np.float64)
    lon = item_df["i_c_longitude"].to_numpy(dtype=np.float64)
    item_df["i_c_latitude"] = np.where(
        np.isnan(lat), 0, (np.trunc(np.nan_to_num(lat) + 90) / 10).astype(np.int64) + 1)
    item_df["i_c_longitude"] = np.where(
        np.isnan(lon), 0, (np.trunc(np.nan_to_num(lon) + 180) / 10).astype(np.int64) + 1)

    # month index from min year (xing.py:101-107)
    created = pd.to_datetime(item_df["i_c_created_at"], unit="s")
    year = created.dt.year
    month = created.dt.month
    min_year = year.min()
    month_index = (year.fillna(-1) - min_year) * 12 + month.fillna(-1)
    item_df["i_c_created_at"] = month_index.map(lambda x: int(x) if x > 0 else 0)

    item_df[C.IID] = item_df[C.IID].astype(np.int32)
    for feature in ITEM_FEATURES:
        item_df[feature] = item_df[feature].astype(np.int8)
    item_df = item_df.sort_values(C.IID, kind="mergesort").reset_index(drop=True)
    item_df.to_feather(os.path.join(raw_dir, "pre_item.feather"))
    return item_df


def prepare_interaction_data(raw_name: str = "XING",
                             interactions_csv: str = "interactions.csv") -> pd.DataFrame:
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    interaction_df = pd.read_csv(os.path.join(raw_dir, interactions_csv), sep="\t")
    interaction_df.columns = [C.UID, C.IID, C.LABEL, C.TIME]
    interaction_df = interaction_df.sort_values(by=[C.UID, C.LABEL], kind="mergesort")
    interaction_df = interaction_df.drop_duplicates([C.UID, C.IID], keep="last")
    interaction_df = interaction_df.sort_values(by=[C.UID, C.TIME], kind="mergesort")
    interaction_df[C.RATE] = interaction_df[C.LABEL].map(LABEL_TO_RATE).astype(np.int8)
    interaction_df[C.LABEL] = interaction_df[C.LABEL].map(LABEL_TO_LABEL).astype(np.int8)
    interaction_df = interaction_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    interaction_df = interaction_df.reset_index(drop=True)
    interaction_df.to_feather(os.path.join(raw_dir, "pre_interaction.feather"))
    return interaction_df


def _warm_interactions(interaction_df: pd.DataFrame, warm_n: int) -> pd.DataFrame:
    pos_counts = interaction_df[interaction_df[C.LABEL] == 1].groupby(C.UID).size()
    warm_users = pos_counts[pos_counts >= warm_n].index
    return interaction_df[interaction_df[C.UID].isin(warm_users)]


def format_xing(dataset_name: str = "XING-PN", raw_name: str = "XING",
                info: str = "XING RecSys 2017, challenge-scored labels") -> str:
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    description = DatasetDescription(info=info)

    user_df = pd.read_feather(os.path.join(raw_dir, "pre_user.feather"))
    item_df = pd.read_feather(os.path.join(raw_dir, "pre_item.feather"))
    interaction_df = pd.read_feather(os.path.join(raw_dir, "pre_interaction.feather"))

    for feature in USER_FEATURES:
        meta = FeatureMeta(feature, C.CATEGORICAL_COLUMN)
        if feature == "u_c_country":
            meta.info[C.INT_MAP] = COUNTRY_INT_MAP
        description.user_features.append(meta)
    for feature in ITEM_FEATURES:
        meta = FeatureMeta(feature, C.CATEGORICAL_COLUMN)
        if feature == "i_c_country":
            meta.info[C.INT_MAP] = COUNTRY_INT_MAP
        description.item_features.append(meta)

    interaction_df = _warm_interactions(interaction_df, 1)

    iid_map = get_int_map(set(interaction_df[C.IID]) & set(item_df[C.IID]), start=1)
    interaction_df = interaction_df[interaction_df[C.IID].isin(iid_map)]
    interaction_df[C.IID] = interaction_df[C.IID].map(iid_map).astype(np.int32)
    item_df = item_df[item_df[C.IID].isin(iid_map)].reset_index(drop=True)
    item_df[C.IID] = item_df[C.IID].map(iid_map).astype(np.int32)
    item_df = item_df.sort_values(C.IID, kind="mergesort").reset_index(drop=True)

    uid_map = get_int_map(set(interaction_df[C.UID]) & set(user_df[C.UID]), start=1)
    interaction_df = interaction_df[interaction_df[C.UID].isin(uid_map)]
    interaction_df[C.UID] = interaction_df[C.UID].map(uid_map).astype(np.int32)
    user_df = user_df[user_df[C.UID].isin(uid_map)].reset_index(drop=True)
    user_df[C.UID] = user_df[C.UID].map(uid_map).astype(np.int32)
    user_df = user_df.sort_values(C.UID, kind="mergesort").reset_index(drop=True)
    interaction_df = interaction_df.reset_index(drop=True)

    # canonical int32 dtypes for the base columns
    for column in (C.RATE, C.LABEL, C.TIME):
        interaction_df[column] = interaction_df[column].astype(np.int32)
    description.base_features = [
        FeatureMeta(name, C.CATEGORICAL_COLUMN)
        for name in (C.UID, C.IID, C.RATE, C.LABEL, C.TIME)
    ]

    merge_df = interaction_df.merge(user_df, on=C.UID, how="left") \
                             .merge(item_df, on=C.IID, how="left")
    return _save_canonical(dataset_name, interaction_df, merge_df, item_df,
                           user_df, description)
