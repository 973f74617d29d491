"""Reader-layer tests: columnar batches reproduce the reference reader
semantics (SimpleDataReader.py / HistoryDataReader.py / SVDPPDataReader.py /
ValueRLDataReader.py) on a hermetic synthetic dataset."""

import numpy as np
import pytest

from pytorchrec_tpu.data import (
    HistoryDataReader,
    SVDPPDataReader,
    SimpleDataReader,
    SplitMode,
    TrainMode,
    ValueRLDataReader,
    eval_batches,
    train_batches,
)
from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML-Readers"


@pytest.fixture()
def dataset(work_dir):
    generate_synthetic_ml(DATASET, n_users=60, n_items=150, seed=7)
    return DATASET


def make_reader(dataset, cls=SimpleDataReader, **kwargs):
    defaults = dict(
        split_mode=SplitMode.LEAVE_K_OUT,
        warm_n=5,
        vt_ratio=0.1,
        leave_k=1,
        neg_sample_n=19,
        load_feature=False,
        append_id=False,
        train_mode=TrainMode.POINT_WISE,
        random_seed=2020,
    )
    defaults.update(kwargs)
    return cls(dataset, **defaults)


def test_simple_reader_leave_k_out_layout(dataset):
    reader = make_reader(dataset)
    assert reader.get_dev_dataset_size() == reader.get_test_dataset_size()
    # one dev/test row per eligible user under leave-1-out
    dev = reader.get_dev_batch(np.arange(reader.get_dev_dataset_size()))
    assert dev[C.IID].shape == (reader.get_dev_dataset_size(), 1 + 19)
    # column 0 is the positive item of the split row
    assert np.array_equal(dev[C.IID][:, 0], reader.splits["dev"][C.IID])
    # negatives never collide with the user's positive history
    for row in range(min(10, len(dev[C.UID]))):
        uid = int(dev[C.UID][row])
        pos_set = reader._user_pos_his_set_dict or {}
        # load on demand (pointwise mode doesn't preload the dict)
        from pytorchrec_tpu.data.process.vt_negative_sample import load_user_pos_his_set_dict

        pos_set = load_user_pos_his_set_dict(dataset)[uid]
        assert not (set(dev[C.IID][row, 1:].tolist()) & pos_set)


def test_simple_reader_feature_columns(dataset):
    reader = make_reader(dataset)
    columns = reader.get_feature_column_dict()
    for name in (C.UID, C.IID, C.RATE, C.LABEL, C.TIME):
        assert name in columns
    assert columns[C.UID].category_num == int(reader.interaction_df[C.UID].max()) + 1


def test_pairwise_train_neg_sample(dataset):
    reader = make_reader(dataset, train_mode=TrainMode.PAIR_WISE)
    # train keeps positives only
    assert (reader.splits["train"][C.LABEL] == 1).all()
    reader.train_neg_sample()
    pairs = reader.train_iid_pair_array
    assert pairs.shape == (reader.get_train_dataset_size(), 2)
    uids = reader.splits["train"][C.UID]
    for i in range(len(uids)):
        assert int(pairs[i, 1]) not in reader._user_pos_his_set_dict[int(uids[i])]
    # batch serving joins the pair as the IID column
    batch = reader.get_train_batch(np.arange(8))
    assert batch[C.IID].shape == (8, 2)
    assert np.array_equal(batch[C.IID], pairs[:8])


def test_pairwise_rng_stream_matches_reference_algorithm(dataset):
    """The vectorized sampler must consume the RNG exactly like the reference's
    row loop (SimpleDataReader.py:280-300)."""
    reader = make_reader(dataset, train_mode=TrainMode.PAIR_WISE)
    reader.train_neg_sample()
    ours = reader.train_iid_pair_array[:, 1].copy()

    # reference algorithm, re-run from the same seed
    rng = np.random.default_rng(2020)
    uids = reader.splits["train"][C.UID]
    lo, hi = reader.min_iid_array_index, reader.max_iid_array_index
    neg = rng.integers(low=lo, high=hi, size=len(uids), dtype=np.int32)
    for index, uid in enumerate(uids):
        inter = reader._user_pos_his_set_dict[int(uid)]
        while neg[index] in inter:
            neg[index] = rng.integers(low=lo, high=hi, dtype=np.int32)
    assert np.array_equal(ours, neg)


def test_history_reader_columns(dataset):
    reader = make_reader(dataset, cls=HistoryDataReader, max_his_len=6, use_neg_his=True)
    batch = reader.get_train_batch(np.arange(4))
    assert batch[C.POS_HIS].shape == (4, 6)
    assert batch[C.NEG_HIS].shape == (4, 6)
    assert (batch[C.POS_HIS_LEN] >= 1).all()
    assert (batch[C.NEG_HIS_LEN] >= 1).all()
    # dev batches carry both candidates and history
    dev, valid = next(eval_batches(reader, "dev", 4))
    assert dev[C.IID].shape == (4, 20)
    assert dev[C.POS_HIS].shape == (4, 6)


def test_svdpp_reader_iids(dataset):
    reader = make_reader(dataset, cls=SVDPPDataReader, limit=12)
    batch = reader.get_train_batch(np.arange(5))
    assert batch[C.IIDS].shape == (5, 12)
    uid = int(batch[C.UID][0])
    train_uids = reader.splits["train"][C.UID]
    train_iids = reader.splits["train"][C.IID]
    from pytorchrec_tpu.data.process.history import pad_or_cut_array

    expected = pad_or_cut_array(train_iids[train_uids == uid], 12)
    assert np.array_equal(batch[C.IIDS][0], expected)


def test_value_rl_reader_columns(dataset):
    reader = make_reader(
        dataset, cls=ValueRLDataReader, max_state_len=5, use_neg_state=True, rl_sample_len=4
    )
    batch = reader.get_train_batch(np.arange(3))
    for name, width in [
        (C.POS_HIS, 5),
        (C.NEG_HIS, 5),
        (C.POS_NEXT_STATE, 5),
        (C.NEG_NEXT_STATE, 5),
        (C.RL_SAMPLE, 4),
    ]:
        assert batch[name].shape == (3, width), name
    assert (batch[C.POS_NEXT_STATE_LEN] >= 1).all()


def test_train_batches_static_shapes(dataset):
    reader = make_reader(dataset)
    rng = np.random.default_rng(0)
    shapes = {b[C.UID].shape for b in train_batches(reader, 16, rng)}
    assert shapes == {(16,)}
    # shuffled: two epochs differ
    e1 = np.concatenate([b[C.INDEX] for b in train_batches(reader, 16, np.random.default_rng(1))])
    e2 = np.concatenate([b[C.INDEX] for b in train_batches(reader, 16, np.random.default_rng(2))])
    assert not np.array_equal(e1, e2)


def test_eval_batches_padding(dataset):
    reader = make_reader(dataset)
    size = reader.get_dev_dataset_size()
    batch_size = 16
    total = 0
    for batch, valid in eval_batches(reader, "dev", batch_size):
        assert batch[C.UID].shape[0] == batch_size
        total += valid
    assert total == size


def test_sequential_split_mode_scalar_iids(dataset):
    reader = make_reader(dataset, split_mode=SplitMode.SEQUENTIAL_SPLIT)
    dev = reader.get_dev_batch(np.arange(min(8, reader.get_dev_dataset_size())))
    assert dev[C.IID].ndim == 1  # no candidate join in sequential mode


def test_markov_generator_plants_followable_chain(work_dir):
    """markov_strength plants successor-cluster structure in the item CHOICE:
    consecutive interactions land in the successor cluster far above the
    uniform-chance rate, and the chain survives in the positive subset."""
    import pandas as pd

    from pytorchrec_tpu.data.process.datasets.synthetic import (
        generate_synthetic_ml,
    )

    n_items, n_clusters, strength = 300, 10, 0.8
    out = generate_synthetic_ml(
        "Markov-ML", n_users=80, n_items=n_items, seed=5,
        markov_strength=strength, n_clusters=n_clusters,
    )
    df = pd.read_feather(f"{out}/{C.BASE_INTERACTION_FEATHER}")

    # reconstruct the generator's cluster assignment + successor permutation:
    # same seed, same draw order (user/item latent vecs first)
    rng = np.random.default_rng(5)
    rng.normal(size=(80 + 1, 4))
    rng.normal(size=(n_items + 1, 4))
    item_cluster = rng.integers(0, n_clusters, size=n_items + 1)
    succ = rng.permutation(n_clusters)

    def follow_rate(frame):
        hits = total = 0
        for _, g in frame.groupby(C.UID):
            iids = g.sort_values(C.TIME)[C.IID].to_numpy()
            cur, nxt = item_cluster[iids[:-1]], item_cluster[iids[1:]]
            hits += int((succ[cur] == nxt).sum())
            total += len(iids) - 1
        return hits / max(total, 1)

    rate_all = follow_rate(df)
    # uniform chance would be ~1/n_clusters = 0.1
    assert rate_all > 0.5, rate_all
    # the rating bonus keeps the chain visible among positives
    rate_pos = follow_rate(df[df[C.LABEL] == 1])
    assert rate_pos > 0.3, rate_pos
    # without the flag, no structure
    out0 = generate_synthetic_ml("Markov-ML-Off", n_users=80, n_items=n_items,
                                 seed=5)
    df0 = pd.read_feather(f"{out0}/{C.BASE_INTERACTION_FEATHER}")
    assert follow_rate(df0) < 0.25
