"""Native C++ kernel tests: bit-parity with the numpy oracles."""

import numpy as np
import pytest

from pytorchrec_tpu import native
from pytorchrec_tpu.data.process.history import _history_matrix

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ toolchain")


def test_history_matrix_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n = 5000
    uids = rng.integers(1, 60, size=n).astype(np.int32)
    # interleave users but keep per-user chronological order by construction
    iids = rng.integers(1, 500, size=n).astype(np.int32)
    labels = rng.integers(0, 2, size=n).astype(np.int64)
    for k in (1, 5, 10):
        for inclusive in (False, True):
            ours = native.history_matrix(uids, iids, labels > 0, k, inclusive)
            oracle = _history_matrix(uids, iids, labels > 0, k, inclusive)
            np.testing.assert_array_equal(ours, oracle, err_msg=f"k={k} inc={inclusive}")


def test_neg_sample_avoids_positives():
    rng = np.random.default_rng(1)
    n_users, n_items = 40, 200
    hi = n_items + 1
    uids = rng.integers(1, n_users + 1, size=3000).astype(np.int32)
    pos_iids = rng.integers(1, hi, size=3000).astype(np.int64)
    pos_keys = np.unique(uids.astype(np.int64) * hi + pos_iids)

    out = native.neg_sample(uids, 1, hi, pos_keys, seed=42)
    assert out.shape == (3000,)
    assert (out >= 1).all() and (out < hi).all()
    keys = uids.astype(np.int64) * hi + out
    assert not np.isin(keys, pos_keys).any()
    # deterministic for a fixed seed; different seed -> different draws
    again = native.neg_sample(uids, 1, hi, pos_keys, seed=42)
    np.testing.assert_array_equal(out, again)
    other = native.neg_sample(uids, 1, hi, pos_keys, seed=43)
    assert not np.array_equal(out, other)


def test_neg_sample_distribution_uniformish():
    """All non-positive items reachable, roughly uniform."""
    uids = np.full(20000, 1, dtype=np.int32)
    hi = 21
    pos_keys = np.array([1 * hi + 5, 1 * hi + 7], dtype=np.int64)
    out = native.neg_sample(uids, 1, hi, pos_keys, seed=7)
    counts = np.bincount(out, minlength=hi)
    assert counts[5] == 0 and counts[7] == 0
    valid = np.delete(counts[1:], [4, 6])
    assert valid.min() > 0.7 * valid.mean()


def test_reader_fast_neg_sample_mode(work_dir):
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
    from pytorchrec_tpu.utils import constants as C

    generate_synthetic_ml("Native-Fast", n_users=40, n_items=100, seed=5)
    reader = SimpleDataReader(
        "Native-Fast", split_mode=SplitMode.LEAVE_K_OUT, warm_n=5, leave_k=1,
        neg_sample_n=9, train_mode=TrainMode.PAIR_WISE, random_seed=2020,
        neg_sample_mode="fast",
    )
    reader.train_neg_sample()
    pairs1 = reader.train_iid_pair_array[:, 1].copy()
    uids = reader.splits["train"][C.UID]
    for i in range(len(uids)):
        assert int(pairs1[i]) not in reader._user_pos_his_set_dict[int(uids[i])]
    reader.train_neg_sample()  # next epoch draws a fresh stream
    assert not np.array_equal(pairs1, reader.train_iid_pair_array[:, 1])
