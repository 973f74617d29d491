"""Golden parity tests: our vectorized offline pipeline vs the reference's
row-by-row implementations, run head-to-head on the same synthetic dataset.

The reference package at /root/reference is imported (read-only) and its
module-level path constants are monkeypatched into a temp work dir.
"""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from pytorchrec_tpu.data.process import (
    generate_interaction_history_list,
    generate_interaction_next_state_list,
    generate_leave_k_out_split,
    generate_rl_next_item_sample,
    generate_sequential_split,
    generate_vt_negative_sample,
)
from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML"


def _patch_reference_paths(monkeypatch, module, ref_root):
    monkeypatch.setattr(module, "DATASET_DIR", os.path.join(ref_root, "Dataset"), raising=True)


@pytest.fixture()
def dual_dirs(work_dir, monkeypatch, tmp_path):
    """Generate one synthetic dataset, copy it into a second 'reference' work
    dir so both pipelines read identical inputs but write separately."""
    generate_synthetic_ml(DATASET, n_users=60, n_items=300, seed=7)
    ours = os.path.join(work_dir, "Dataset", DATASET)
    ref_root = str(tmp_path / "refwork")
    ref_dataset = os.path.join(ref_root, "Dataset", DATASET)
    shutil.copytree(ours, ref_dataset)
    return ours, ref_root



def _assert_csv_twin_matches(our_dir, ref_dir, npy_name):
    """The human-readable CSV twin is byte-identical to the reference's
    np.savetxt output (SEP-delimited ints; e.g. interaction_history_list.py:84,
    vt_negative_sample.py:115-121, rl_next_item_sample.py:58)."""
    csv = npy_name[: -len(".npy")] + ".csv"
    with open(os.path.join(our_dir, csv), "rb") as fh:
        got = fh.read()
    with open(os.path.join(ref_dir, csv), "rb") as fh:
        want = fh.read()
    assert got == want, csv


class TestSplitParity:
    def test_sequential_split(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.sequential_split as ref_mod

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        ref_mod.generate_sequential_split(DATASET, warm_n=5, vt_ratio=0.1)
        generate_sequential_split(DATASET, warm_n=5, vt_ratio=0.1)

        name = C.SEQUENTIAL_SPLIT_NAME_TEMPLATE % (5, 0.1)
        for template in (C.TRAIN_INDEX_NPY_TEMPLATE, C.DEV_INDEX_NPY_TEMPLATE,
                         C.TEST_INDEX_NPY_TEMPLATE):
            got = np.load(os.path.join(ours, C.SPLIT_INDEX_DIR, template % name))
            want = np.load(os.path.join(ref_root, "Dataset", DATASET, "SPLIT_INDEX", template % name))
            np.testing.assert_array_equal(got, want)
            # the human-readable CSV twin is byte-identical too
            # (reference sequential_split.py:85-88)
            csv = (template % name)[:-len(".npy")] + ".csv"
            with open(os.path.join(ours, C.SPLIT_INDEX_DIR, csv), "rb") as f:
                got_csv = f.read()
            with open(os.path.join(ref_root, "Dataset", DATASET,
                                   "SPLIT_INDEX", csv), "rb") as f:
                want_csv = f.read()
            assert got_csv == want_csv

    def test_leave_k_out_split(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.leave_k_out_split as ref_mod
        import torchrec.data.process.sequential_split as ref_seq

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        _patch_reference_paths(monkeypatch, ref_seq, ref_root)
        ref_mod.generate_leave_k_out_split(DATASET, warm_n=5, k=2)
        generate_leave_k_out_split(DATASET, warm_n=5, k=2)

        name = C.LEAVE_K_OUT_SPLIT_NAME_TEMPLATE % (5, 2)
        for template in (C.TRAIN_INDEX_NPY_TEMPLATE, C.DEV_INDEX_NPY_TEMPLATE,
                         C.TEST_INDEX_NPY_TEMPLATE):
            got = np.load(os.path.join(ours, C.SPLIT_INDEX_DIR, template % name))
            want = np.load(os.path.join(ref_root, "Dataset", DATASET, "SPLIT_INDEX", template % name))
            np.testing.assert_array_equal(got, want)


class TestNegSampleParity:
    def test_vt_negative_sample(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.vt_negative_sample as ref_mod

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        ref_mod.generate_vt_negative_sample(seed=11, dataset_name=DATASET, sample_n=20)
        generate_vt_negative_sample(seed=11, dataset_name=DATASET, sample_n=20, parity=True)

        for template in (C.DEV_NEG_NPY_TEMPLATE, C.TEST_NEG_NPY_TEMPLATE):
            got = np.load(os.path.join(ours, C.NEGATIVE_SAMPLE_DIR, template % (11, 20)))
            want = np.load(os.path.join(ref_root, "Dataset", DATASET, "NEGATIVE_SAMPLE", template % (11, 20)))
            np.testing.assert_array_equal(got, want)
            _assert_csv_twin_matches(
                os.path.join(ours, C.NEGATIVE_SAMPLE_DIR),
                os.path.join(ref_root, "Dataset", DATASET, "NEGATIVE_SAMPLE"),
                template % (11, 20))

    def test_fast_mode_valid(self, dual_dirs):
        ours, _ = dual_dirs
        generate_vt_negative_sample(seed=3, dataset_name=DATASET, sample_n=15, parity=False)
        dev = np.load(os.path.join(ours, C.NEGATIVE_SAMPLE_DIR, C.DEV_NEG_NPY_TEMPLATE % (3, 15)))
        test = np.load(os.path.join(ours, C.NEGATIVE_SAMPLE_DIR, C.TEST_NEG_NPY_TEMPLATE % (3, 15)))
        assert dev.shape == test.shape == (60, 15)
        # no sampled id may be a positive of its user
        import pandas as pd

        df = pd.read_feather(os.path.join(ours, C.BASE_INTERACTION_FEATHER))
        for row, uid in enumerate(df[C.UID].unique()):
            pos = set(df[(df[C.UID] == uid) & (df[C.LABEL] == 1)][C.IID].tolist())
            assert not (set(dev[row].tolist()) & pos)
            assert not (set(test[row].tolist()) & pos)
            # dev/test halves are disjoint and unique
            assert len(set(dev[row]) | set(test[row])) == 30


class TestHistoryParity:
    def test_history_list(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.interaction_history_list as ref_mod

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        ref_mod.generate_interaction_history_list(DATASET, k=8)
        generate_interaction_history_list(DATASET, k=8)

        for template in (C.POS_HIS_NPY_TEMPLATE, C.NEG_HIS_NPY_TEMPLATE):
            got = np.load(os.path.join(ours, C.HISTORY_DIR, template % 8))
            want = np.load(os.path.join(ref_root, "Dataset", DATASET, "HISTORY", template % 8))
            np.testing.assert_array_equal(got, want)
            _assert_csv_twin_matches(
                os.path.join(ours, C.HISTORY_DIR),
                os.path.join(ref_root, "Dataset", DATASET, "HISTORY"),
                template % 8)

    def test_next_state_list(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.interaction_next_state_list as ref_mod

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        ref_mod.generate_interaction_next_state_list(DATASET, k=8)
        generate_interaction_next_state_list(DATASET, k=8)

        for template in (C.POS_NEXT_STATE_NPY_TEMPLATE, C.NEG_NEXT_STATE_NPY_TEMPLATE):
            got = np.load(os.path.join(ours, C.NEXT_STATE_DIR, template % 8))
            want = np.load(os.path.join(ref_root, "Dataset", DATASET, "NEXT_STATE", template % 8))
            np.testing.assert_array_equal(got, want)
            _assert_csv_twin_matches(
                os.path.join(ours, C.NEXT_STATE_DIR),
                os.path.join(ref_root, "Dataset", DATASET, "NEXT_STATE"),
                template % 8)

    def test_rl_sample(self, dual_dirs, monkeypatch):
        ours, ref_root = dual_dirs
        import torchrec.data.process.rl_next_item_sample as ref_mod

        _patch_reference_paths(monkeypatch, ref_mod, ref_root)
        ref_mod.generate_rl_next_item_sample(DATASET, sample_len=9)
        generate_rl_next_item_sample(DATASET, sample_len=9)

        got = np.load(os.path.join(ours, C.RL_SAMPLE_DIR, C.RL_SAMPLE_NPY_TEMPLATE % 9))
        want = np.load(os.path.join(ref_root, "Dataset", DATASET, "RL_SAMPLE", C.RL_SAMPLE_NPY_TEMPLATE % 9))
        np.testing.assert_array_equal(got, want)
        _assert_csv_twin_matches(
            os.path.join(ours, C.RL_SAMPLE_DIR),
            os.path.join(ref_root, "Dataset", DATASET, "RL_SAMPLE"),
            C.RL_SAMPLE_NPY_TEMPLATE % 9)
