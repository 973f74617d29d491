"""Raw-dataset formatter tests: tiny synthetic raw files in the ORIGINAL
on-disk formats (u.data / ratings.dat / review JSON / XING TSVs) run through
the formatters, canonical artifacts verified (reference proprecess/
semantics: label maps, stable (uid,time) sort, id remaps, feature
engineering)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from pytorchrec_tpu.data.process.datasets import (
    format_amazon,
    format_jester,
    format_movielens_100k,
    format_movielens_1m,
    format_movielens_10m,
    format_xing,
    prepare_interaction_data,
    prepare_item_data,
    prepare_user_data,
)
from pytorchrec_tpu.utils import constants as C


@pytest.fixture()
def raw_dir(work_dir):
    path = C.raw_data_dir()
    os.makedirs(path, exist_ok=True)
    return path


def _read(dataset, name):
    return pd.read_feather(os.path.join(C.dataset_dir(), dataset, name))


def test_movielens_100k(raw_dir):
    d = os.path.join(raw_dir, "MovieLens-100K")
    os.makedirs(d)
    # u.data: uid \t iid \t rate \t time (deliberately unsorted)
    rows = [(2, 1, 5, 300), (1, 2, 3, 100), (1, 1, 4, 200), (2, 2, 1, 50)]
    with open(os.path.join(d, "u.data"), "w") as f:
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")
    # u.user: uid|age|gender|occupation|zip
    with open(os.path.join(d, "u.user"), "w") as f:
        f.write("1|24|M|technician|85711\n2|53|F|other|94043\n")
    # u.item.utf8: iid|title|date|vdate|url|19 genre flags
    with open(os.path.join(d, "u.item.utf8"), "w") as f:
        f.write("1|Toy Story (1995)|01-Jan-1995|||" + "|".join(["0"] * 3 + ["1"] + ["0"] * 15) + "\n")
        f.write("2|GoldenEye (1967)|01-Jan-1967|||" + "|".join(["1"] + ["0"] * 18) + "\n")

    format_movielens_100k("ML100K-T")
    base = _read("ML100K-T", C.BASE_INTERACTION_FEATHER)
    # sorted by (uid, time); label binarized at 4
    assert base[C.UID].tolist() == [1, 1, 2, 2]
    assert base[C.TIME].tolist() == [100, 200, 50, 300]
    assert base[C.LABEL].tolist() == [0, 1, 0, 1]
    # merged interaction has user + item features
    inter = _read("ML100K-T", C.INTERACTION_FEATHER)
    assert "u_c_age" in inter and "i_c_year" in inter and "i_c_animation" in inter
    # age 24 -> bucket 1 (18-24), 53 -> bucket 5 (50-55)
    users = _read("ML100K-T", C.USER_FEATHER)
    assert users["u_c_age"].tolist() == [1, 5]
    assert users["u_c_gender"].tolist() == [0, 1]
    # year 1995 -> boundaries [1940..1985, 1990, 1991, ..] ; 1967 -> bucket 3
    items = _read("ML100K-T", C.ITEM_FEATHER)
    assert items["i_c_year"].tolist()[1] == 3


def test_movielens_1m(raw_dir):
    d = os.path.join(raw_dir, "MovieLens-1M")
    os.makedirs(d)
    with open(os.path.join(d, "ratings.dat"), "w") as f:
        f.write("1::10::5::300\n1::20::2::100\n2::10::4::50\n")
    with open(os.path.join(d, "users.dat"), "w") as f:
        f.write("1::M::25::15::12345\n2::F::1::0::54321\n")
    with open(os.path.join(d, "movies.dat"), "w") as f:
        f.write("10::Heat (1995)::Action|Crime|Thriller\n20::Sabrina (1995)::Comedy|Romance\n")

    format_movielens_1m("ML1M-T")
    base = _read("ML1M-T", C.BASE_INTERACTION_FEATHER)
    # iid remapped 1-based contiguous (10 -> 1, 20 -> 2)
    assert sorted(base[C.IID].unique().tolist()) == [1, 2]
    assert base[C.LABEL].tolist() == [0, 1, 1]  # sorted (uid,time): (1,100,r2),(1,300,r5),(2,50,r4)
    items = _read("ML1M-T", C.ITEM_FEATHER)
    assert items[C.IID].tolist() == [1, 2]
    assert items["i_c_action"].tolist() == [1, 0]
    assert items["i_c_romance"].tolist() == [0, 1]


def test_movielens_10m(raw_dir):
    d = os.path.join(raw_dir, "MovieLens-10M")
    os.makedirs(d)
    with open(os.path.join(d, "ratings.dat"), "w") as f:
        f.write("5::100::4.5::300\n5::200::2.0::100\n9::100::3.5::50\n")
    format_movielens_10m("ML10M-T")
    base = _read("ML10M-T", C.BASE_INTERACTION_FEATHER)
    # uid/iid remapped 1-based: users {5,9} -> {1,2}, items {100,200} -> {1,2}
    assert sorted(base[C.UID].unique().tolist()) == [1, 2]
    assert sorted(base[C.IID].unique().tolist()) == [1, 2]
    # 4.5 -> 1, 2.0 -> 0, 3.5 -> 0
    assert base[C.LABEL].tolist() == [0, 1, 0]


def test_amazon(raw_dir):
    path = os.path.join(raw_dir, "reviews_Tiny_5.json")
    rows = [
        {"reviewerID": "B", "asin": "Y", "overall": 5.0, "unixReviewTime": 200},
        {"reviewerID": "A", "asin": "X", "overall": 2.0, "unixReviewTime": 100},
        {"reviewerID": "A", "asin": "Y", "overall": 4.0, "unixReviewTime": 300},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    format_amazon("Amazon-T", "reviews_Tiny_5.json")
    base = _read("Amazon-T", C.BASE_INTERACTION_FEATHER)
    # A -> 1, B -> 2 (sorted int map, 1-based); X -> 1, Y -> 2
    assert base[C.UID].tolist() == [1, 1, 2]
    assert base[C.IID].tolist() == [1, 2, 2]
    assert base[C.LABEL].tolist() == [0, 1, 1]


def test_jester(raw_dir):
    path = os.path.join(raw_dir, "jester_ratings.dat")
    with open(path, "w") as f:
        f.write("1\t\t7\t\t9.5\n1\t\t8\t\t-3.2\n2\t\t7\t\t0.0\n")
    format_jester("Jester-T")
    base = _read("Jester-T", C.BASE_INTERACTION_FEATHER)
    assert base[C.LABEL].tolist() == [1, 0, 0]
    assert base[C.TIME].tolist() == [0, 1, 2]  # synthetic time = row index
    assert base[C.RATE].tolist() == [9, -3, 0]


def test_xing(raw_dir):
    d = os.path.join(raw_dir, "XING")
    os.makedirs(d)
    users = pd.DataFrame({
        "user_id": [10, 20],
        "jobroles": ["1,2", "3"],
        "career_level": [3, 4],
        "discipline_id": [5, 6],
        "industry_id": [7, 8],
        "country": ["de", "non_dach"],
        "region": [1, 2],
        "experience_n_entries_class": [1, 2],
        "experience_years_experience": [3, 4],
        "experience_years_in_current": [2, 1],
        "edu_degree": [1, 2],
        "edu_fieldofstudies": ["a", "b"],
        "wtcj": [0, 1],
        "premium": [1, 0],
    })
    users.to_csv(os.path.join(d, "users.csv"), sep="\t", index=False)
    items = pd.DataFrame({
        "item_id": [100, 200],
        "title": ["t1", "t2"],
        "career_level": [3, 4],
        "discipline_id": [5, 6],
        "industry_id": [7, 8],
        "country": ["at", "ch"],
        "is_payed": [0, 1],
        "region": [1, 2],
        "latitude": [48.2, np.nan],
        "longitude": [16.4, np.nan],
        "employment": [1, 2],
        "tags": ["x", "y"],
        "created_at": [1480000000, 1490000000],
    })
    items.to_csv(os.path.join(d, "items.csv"), sep="\t", index=False)
    inter = pd.DataFrame({
        "user_id": [10, 10, 10, 20],
        "item_id": [100, 100, 200, 100],
        "interaction_type": [0, 2, 1, 4],  # dup (10,100): keep strongest (2)
        "created_at": [5, 6, 7, 8],
    })
    inter.to_csv(os.path.join(d, "interactions.csv"), sep="\t", index=False)

    prepare_user_data()
    prepare_item_data()
    prepare_interaction_data()
    format_xing("XING-T")

    base = _read("XING-T", C.BASE_INTERACTION_FEATHER)
    # user 20 only has a 'delete' (type 4 -> label 0) -> filtered by warm(1);
    # dup (10,100) keeps type 2 -> rate 5, label 1
    assert base[C.UID].unique().tolist() == [1]
    assert len(base) == 2
    assert base[C.RATE].tolist() == [5, 1]
    assert base[C.LABEL].tolist() == [1, 1]
    items_out = _read("XING-T", C.ITEM_FEATHER)
    # NaN lat/long -> 0; 48.2 -> int(138/10)+1 = 14
    assert items_out["i_c_latitude"].tolist() == [14, 0]


def test_criteo(raw_dir):
    from pytorchrec_tpu.data.process.datasets import format_criteo
    import glob

    d = os.path.join(raw_dir, "criteo")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(500):
        label = str(rng.integers(0, 2))
        dense = [str(rng.integers(-1, 100)) if rng.random() > 0.2 else ""
                 for _ in range(13)]
        sparse = [format(int(rng.integers(0, 2**32)), "08x") if rng.random() > 0.1 else ""
                  for _ in range(26)]
        rows.append("\t".join([label] + dense + sparse))
    with open(os.path.join(d, "train.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")

    out = format_criteo("Criteo-T", "criteo/train.txt", hash_bucket=1000,
                        rows_per_shard=200, sample_rows=300, chunk_rows=150)
    shards = sorted(glob.glob(os.path.join(out, "shards", "*.parquet")))
    assert len(shards) == 2  # chunk-granular flush: 300 + 200 rows
    df = pd.concat([pd.read_parquet(s) for s in shards], ignore_index=True)
    assert len(df) == 500
    assert set(df.columns) == {C.LABEL} | {f"d_{i}" for i in range(13)} | {f"c_{i}" for i in range(26)}
    assert df["d_0"].dtype == np.float32 and (df["d_0"] >= 0).all()
    assert df["c_0"].dtype == np.int32
    assert df["c_0"].between(0, 999).all()

    # canonical sample artifacts exist and load through the reader
    from pytorchrec_tpu.data import CTRDataReader, SplitMode, TrainMode

    reader = CTRDataReader("Criteo-T", split_mode=SplitMode.SEQUENTIAL_SPLIT,
                           warm_n=1, vt_ratio=0.1,
                           train_mode=TrainMode.POINT_WISE, random_seed=1)
    batch = reader.get_train_batch(np.arange(8))
    assert "c_0" in batch and "d_0" in batch

    # streaming source consumes the shards
    from pytorchrec_tpu.data.streaming import StreamingBatchSource

    source = StreamingBatchSource(os.path.join(out, "shards", "part-*.parquet"),
                                  batch_size=64, chunk_rows=100)
    first = next(source.batches(epochs=1))
    assert first["c_0"].shape == (64,)
