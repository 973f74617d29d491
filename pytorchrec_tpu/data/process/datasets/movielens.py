"""MovieLens raw-data formatters (100K / 1M / 10M).

Capability parity with reference proprecess/movielens-100k.py:31-187,
movielens-1m.py:31-219, movielens-10m.py:31-128: read the raw GroupLens
files from ``RawData/<raw_name>/``, bucketize/int-map features, binarize the
label via ``rank_to_label``, sort by (uid, time) with a stable sort, and
write the canonical artifact set. Feature engineering is vectorized
(searchsorted bucketize, str.get_dummies genre flags) instead of per-row
``map`` loops.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Union

import numpy as np
import pandas as pd

from pytorchrec_tpu.data.process.features import bucketize_array, get_int_map
from pytorchrec_tpu.data.schema import DatasetDescription, FeatureMeta
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)

ML100K_GENRES = [
    "i_c_unknown", "i_c_action", "i_c_adventure", "i_c_animation", "i_c_children",
    "i_c_comedy", "i_c_crime", "i_c_documentary", "i_c_drama", "i_c_fantasy",
    "i_c_film_noir", "i_c_horror", "i_c_musical", "i_c_mystery", "i_c_romance",
    "i_c_sci_fi", "i_c_thriller", "i_c_war", "i_c_western",
]

ML1M_GENRE_MAP = {
    "Action": "i_c_action", "Adventure": "i_c_adventure", "Animation": "i_c_animation",
    "Children's": "i_c_children", "Comedy": "i_c_comedy", "Crime": "i_c_crime",
    "Documentary": "i_c_documentary", "Drama": "i_c_drama", "Fantasy": "i_c_fantasy",
    "Film-Noir": "i_c_film_noir", "Horror": "i_c_horror", "Musical": "i_c_musical",
    "Mystery": "i_c_mystery", "Romance": "i_c_romance", "Sci-Fi": "i_c_sci_fi",
    "Thriller": "i_c_thriller", "War": "i_c_war", "Western": "i_c_western",
}

U_AGE, U_GENDER, U_OCCUPATION = "u_c_age", "u_c_gender", "u_c_occupation"
I_YEAR = "i_c_year"
ML1M_AGE_BOUNDARIES = [18, 25, 35, 45, 50, 56]
GENDER_INT_MAP = {"M": 0, "F": 1}


def _apply_label(interaction_df: pd.DataFrame,
                 rank_to_label: Union[Dict, Callable]) -> None:
    if callable(rank_to_label):
        interaction_df[C.LABEL] = interaction_df[C.RATE].map(rank_to_label)
    else:
        interaction_df[C.LABEL] = interaction_df[C.RATE].map(rank_to_label)
    interaction_df[C.LABEL] = interaction_df[C.LABEL].astype(np.int32)


def _year_boundaries(years: pd.Series):
    return [1940, 1950, 1960, 1970, 1980, 1985] + list(range(1990, int(years.max()) + 1))


def _save_canonical(dataset_name: str, interaction_df: pd.DataFrame,
                    merge_df: pd.DataFrame, item_df: pd.DataFrame,
                    user_df: pd.DataFrame, description: DatasetDescription) -> str:
    out_dir = os.path.join(C.dataset_dir(), dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    assert (interaction_df.dtypes == np.int32).all(), interaction_df.dtypes
    base = merge_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    base.to_csv(os.path.join(out_dir, C.BASE_INTERACTION_CSV), index=False, sep=C.SEP)
    base.reset_index(drop=True).to_feather(os.path.join(out_dir, C.BASE_INTERACTION_FEATHER))
    merge_df.to_csv(os.path.join(out_dir, C.INTERACTION_CSV), index=False, sep=C.SEP)
    merge_df.reset_index(drop=True).to_feather(os.path.join(out_dir, C.INTERACTION_FEATHER))
    item_df.to_csv(os.path.join(out_dir, C.ITEM_CSV), index=False, sep=C.SEP)
    item_df.reset_index(drop=True).to_feather(os.path.join(out_dir, C.ITEM_FEATHER))
    user_df.to_csv(os.path.join(out_dir, C.USER_CSV), index=False, sep=C.SEP)
    user_df.reset_index(drop=True).to_feather(os.path.join(out_dir, C.USER_FEATHER))
    description.compute_interaction_stats(
        merge_df[C.UID].to_numpy(), merge_df[C.LABEL].to_numpy()
    )
    description.save(dataset_name)
    return out_dir


def format_movielens_100k(
    dataset_name: str = "MovieLens-100K-PN",
    raw_name: str = "MovieLens-100K",
    rank_to_label: Union[Dict, Callable] = None,
    info: str = "MovieLens-100K, rate>=4 positive",
) -> str:
    """Reference proprecess/movielens-100k.py:31-169 semantics."""
    rank_to_label = rank_to_label or {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    description = DatasetDescription(info=info)

    # users: uid | age | gender | occupation
    user_df = pd.read_csv(os.path.join(raw_dir, "u.user"), sep="|", header=None,
                          usecols=[0, 1, 2, 3])
    user_df.columns = [C.UID, U_AGE, U_GENDER, U_OCCUPATION]
    assert not user_df.isnull().any().any()
    user_df[U_AGE] = bucketize_array(user_df[U_AGE].to_numpy(), ML1M_AGE_BOUNDARIES).astype(np.int32)
    description.user_features.append(FeatureMeta(
        U_AGE, C.CATEGORICAL_COLUMN, {C.BUCKET_BOUNDARIES: ML1M_AGE_BOUNDARIES}))
    user_df[U_GENDER] = user_df[U_GENDER].map(GENDER_INT_MAP).astype(np.int32)
    description.user_features.append(FeatureMeta(
        U_GENDER, C.CATEGORICAL_COLUMN, {C.INT_MAP: GENDER_INT_MAP}))
    occupation_map = get_int_map(user_df[U_OCCUPATION])
    user_df[U_OCCUPATION] = user_df[U_OCCUPATION].map(occupation_map).astype(np.int32)
    description.user_features.append(FeatureMeta(
        U_OCCUPATION, C.CATEGORICAL_COLUMN, {C.INT_MAP: occupation_map}))
    user_df[C.UID] = user_df[C.UID].astype(np.int32)

    # items: iid | title | release date | video date | url | 19 genre flags
    item_df = pd.read_csv(
        os.path.join(raw_dir, "u.item.utf8"), sep="|", header=None,
        usecols=[0, 2] + list(range(5, 24)),
    )
    item_df.columns = [C.IID, I_YEAR] + ML100K_GENRES
    item_df[I_YEAR] = item_df[I_YEAR].fillna("-1")
    assert not item_df.isnull().any().any()
    years = item_df[I_YEAR].map(lambda s: int(str(s)[-4:]))
    boundaries = _year_boundaries(years)
    item_df[I_YEAR] = bucketize_array(years.to_numpy(), boundaries).astype(np.int32)
    description.item_features.append(FeatureMeta(
        I_YEAR, C.CATEGORICAL_COLUMN, {C.BUCKET_BOUNDARIES: boundaries}))
    for genre in ML100K_GENRES:
        item_df[genre] = item_df[genre].astype(np.int32)
        description.item_features.append(FeatureMeta(genre, C.CATEGORICAL_COLUMN))
    item_df[C.IID] = item_df[C.IID].astype(np.int32)

    # interactions: uid \t iid \t rate \t time
    interaction_df = pd.read_csv(os.path.join(raw_dir, "u.data"), sep="\t",
                                 header=None, dtype=np.int32)
    interaction_df.columns = [C.UID, C.IID, C.RATE, C.TIME]
    assert not interaction_df.isnull().any().any()
    _apply_label(interaction_df, rank_to_label)
    interaction_df = interaction_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    interaction_df = interaction_df.sort_values(
        by=[C.UID, C.TIME], kind="mergesort").reset_index(drop=True)
    description.base_features = [
        FeatureMeta(name, C.CATEGORICAL_COLUMN)
        for name in (C.UID, C.IID, C.RATE, C.LABEL, C.TIME)
    ]

    merge_df = interaction_df.merge(user_df, on=C.UID, how="left") \
                             .merge(item_df, on=C.IID, how="left")
    return _save_canonical(dataset_name, interaction_df, merge_df, item_df,
                           user_df, description)


def format_movielens_1m(
    dataset_name: str = "MovieLens-1M-PN",
    raw_name: str = "MovieLens-1M",
    rank_to_label: Union[Dict, Callable] = None,
    info: str = "MovieLens-1M, rate>=4 positive",
) -> str:
    """Reference proprecess/movielens-1m.py:31-219 semantics (incl. the
    iid remap to contiguous 1-based ids over interaction∩item)."""
    rank_to_label = rank_to_label or {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    description = DatasetDescription(info=info)

    user_df = pd.read_csv(os.path.join(raw_dir, "users.dat"), sep="::", header=None,
                          usecols=[0, 1, 2, 3], engine="python")
    user_df.columns = [C.UID, U_GENDER, U_AGE, U_OCCUPATION]
    assert not user_df.isnull().any().any()
    user_df[U_GENDER] = user_df[U_GENDER].map(GENDER_INT_MAP).astype(np.int32)
    description.user_features.append(FeatureMeta(
        U_GENDER, C.CATEGORICAL_COLUMN, {C.INT_MAP: GENDER_INT_MAP}))
    age_map = get_int_map(user_df[U_AGE])
    user_df[U_AGE] = user_df[U_AGE].map(age_map).astype(np.int32)
    description.user_features.append(FeatureMeta(
        U_AGE, C.CATEGORICAL_COLUMN, {C.INT_MAP: age_map}))
    user_df[U_OCCUPATION] = user_df[U_OCCUPATION].astype(np.int32)
    description.user_features.append(FeatureMeta(U_OCCUPATION, C.CATEGORICAL_COLUMN))
    user_df[C.UID] = user_df[C.UID].astype(np.int32)

    item_df = pd.read_csv(os.path.join(raw_dir, "movies.dat"), sep="::", header=None,
                          usecols=[0, 1, 2], engine="python",
                          encoding="latin-1")
    item_df.columns = [C.IID, I_YEAR, "type"]
    years = item_df[I_YEAR].map(lambda s: int(str(s)[-5:-1]))
    boundaries = _year_boundaries(years)
    item_df[I_YEAR] = bucketize_array(years.to_numpy(), boundaries).astype(np.int32)
    description.item_features.append(FeatureMeta(
        I_YEAR, C.CATEGORICAL_COLUMN, {C.BUCKET_BOUNDARIES: boundaries}))
    genre_flags = item_df["type"].str.get_dummies(sep="|")
    for raw_genre, flag_name in ML1M_GENRE_MAP.items():
        values = genre_flags[raw_genre] if raw_genre in genre_flags else 0
        item_df[flag_name] = np.asarray(values, dtype=np.int32) * np.ones(len(item_df), np.int32)
        description.item_features.append(FeatureMeta(flag_name, C.CATEGORICAL_COLUMN))
    item_df = item_df.drop(columns="type")
    assert not item_df.isnull().any().any()
    item_df[C.IID] = item_df[C.IID].astype(np.int32)

    interaction_df = pd.read_csv(os.path.join(raw_dir, "ratings.dat"), sep="::",
                                 header=None, engine="python", dtype=np.int32)
    interaction_df.columns = [C.UID, C.IID, C.RATE, C.TIME]
    assert not interaction_df.isnull().any().any()
    _apply_label(interaction_df, rank_to_label)
    interaction_df = interaction_df[[C.UID, C.IID, C.RATE, C.LABEL, C.TIME]]
    interaction_df = interaction_df.sort_values(
        by=[C.UID, C.TIME], kind="mergesort").reset_index(drop=True)

    # remap iids to contiguous 1-based over interaction ∩ item
    # (movielens-1m.py:135-137; 0 stays the PAD id)
    iid_map = get_int_map(
        set(interaction_df[C.IID]) & set(item_df[C.IID]), start=1
    )
    interaction_df[C.IID] = interaction_df[C.IID].map(iid_map).astype(np.int32)
    item_df = item_df[item_df[C.IID].isin(iid_map)].reset_index(drop=True)
    item_df[C.IID] = item_df[C.IID].map(iid_map).astype(np.int32)
    item_df = item_df.sort_values(C.IID, kind="mergesort").reset_index(drop=True)

    description.base_features = [
        FeatureMeta(name, C.CATEGORICAL_COLUMN)
        for name in (C.UID, C.IID, C.RATE, C.LABEL, C.TIME)
    ]
    merge_df = interaction_df.merge(user_df, on=C.UID, how="left") \
                             .merge(item_df, on=C.IID, how="left")
    return _save_canonical(dataset_name, interaction_df, merge_df, item_df,
                           user_df, description)


def format_movielens_10m(
    dataset_name: str = "MovieLens-10M-PN",
    raw_name: str = "MovieLens-10M",
    rank_to_label: Callable = None,
    info: str = "MovieLens-10M, rate>=4 positive",
) -> str:
    """Reference proprecess/movielens-10m.py:31-105 semantics: featureless,
    uid/iid remapped 1-based, float rates thresholded by a callable."""
    rank_to_label = rank_to_label or (lambda x: 1 if x >= 4.0 else 0)
    raw_dir = os.path.join(C.raw_data_dir(), raw_name)
    description = DatasetDescription(info=info)

    interaction_df = pd.read_csv(os.path.join(raw_dir, "ratings.dat"), sep="::",
                                 header=None, engine="python")
    interaction_df.columns = [C.UID, C.IID, C.RATE, C.TIME]
    assert not interaction_df.isnull().any().any()
    interaction_df[C.UID] = interaction_df[C.UID].map(
        get_int_map(interaction_df[C.UID], start=1)).astype(np.int32)
    interaction_df[C.IID] = interaction_df[C.IID].map(
        get_int_map(interaction_df[C.IID], start=1)).astype(np.int32)
    interaction_df[C.LABEL] = interaction_df[C.RATE].map(rank_to_label).astype(np.int32)
    interaction_df[C.RATE] = interaction_df[C.RATE].astype(np.int32)
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
