"""Value-RL candidate action sets.

Capability parity with reference data/process/rl_next_item_sample.py:15-61:
for every interaction row, the candidate set is the window of positives around
the user's running positive counter (counter increments *before* sampling on
label==1 rows), ``sample_len//2`` to the left and right (left gets the smaller
half when odd), padded with the window's last element.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict, List

import numpy as np

from pytorchrec_tpu.data.process.history import pad_or_cut_array
from pytorchrec_tpu.data.process.io import dataset_path, read_interactions, save_index_array
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)


def generate_rl_next_item_sample(dataset_name: str, sample_len: int) -> None:
    l_size = sample_len // 2 if sample_len % 2 == 0 else (sample_len - 1) // 2
    r_size = sample_len // 2 if sample_len % 2 == 0 else (sample_len + 1) // 2

    df = read_interactions(dataset_name)
    rl_sample_dir = dataset_path(dataset_name, C.RL_SAMPLE_DIR)
    os.makedirs(rl_sample_dir, exist_ok=True)

    uids = df[C.UID].to_numpy()
    iids = df[C.IID].to_numpy().astype(np.int32)
    labels = df[C.LABEL].to_numpy()

    # per-user positive histories; users with no positives get [0]
    pos_his: Dict[int, np.ndarray] = {}
    for uid in np.unique(uids):
        user_mask = uids == uid
        user_pos = iids[user_mask & (labels == 1)]
        pos_his[int(uid)] = user_pos if len(user_pos) else np.array([0], dtype=np.int32)

    # rows stay in dataset order, grouped per user like the reference's groupby
    order = np.argsort(uids, kind="stable")
    inv_order = np.argsort(order, kind="stable")
    rows: List[np.ndarray] = []
    current_user = None
    counter = 0
    for row in order:
        uid = int(uids[row])
        if uid != current_user:
            current_user = uid
            counter = 0
        if labels[row] == 1:
            counter += 1
        his = pos_his[uid]
        window = his[max(0, counter - l_size) : min(counter + r_size, len(his))]
        rows.append(pad_or_cut_array(window, sample_len, pad=int(window[-1])))

    rl_sample_array = np.vstack(rows)[inv_order]
    assert rl_sample_array.dtype == np.int32, rl_sample_array.dtype
    save_index_array(rl_sample_dir, C.RL_SAMPLE_NPY_TEMPLATE % sample_len,
                     rl_sample_array)
    logger.info("rl sample arrays (len=%d) for %d rows", sample_len, len(df))


def check_rl_next_item_sample(dataset_name: str) -> List[int]:
    rl_dir = dataset_path(dataset_name, C.RL_SAMPLE_DIR)
    if not os.path.isdir(rl_dir):
        return []
    pattern = re.compile(r"^rl_sample_(\d+).npy$")
    lens = []
    for filename in os.listdir(rl_dir):
        match = pattern.match(filename)
        if match:
            lens.append(int(match.group(1)))
    return sorted(lens)
