"""Value-RL reader: history + next-state + RL candidate-action columns.

Capability parity with reference data/ValueRLDataReader.py:15-129. Extends the
history reader with the RL ``s'`` sequences (state *including* the current
interaction) and the per-row candidate action sets ``rl_sample_%d.npy``.
"""

from __future__ import annotations

import os

import numpy as np

from pytorchrec_tpu.data.readers.history import HistoryDataReader
from pytorchrec_tpu.data.schema import SplitMode, TrainMode
from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.utils import constants as C


class ValueRLDataReader(HistoryDataReader):
    def __init__(self, *args, max_state_len: int = 10, use_neg_state: bool = False,
                 rl_sample_len: int = 8, **kwargs):
        self.max_next_state_len = max_state_len
        self.use_neg_next_state = use_neg_state
        self.rl_sample_len = rl_sample_len
        super().__init__(*args, max_his_len=max_state_len,
                         use_neg_his=use_neg_state, **kwargs)

    def _load_dataset(self) -> None:
        self._load_interactions()
        self._create_feature_column_dict()
        self._load_history()
        self._load_next_state()
        self._load_next_item_sample()
        self._load_items()
        self._split_interactions()
        if self.split_mode == SplitMode.LEAVE_K_OUT:
            self._load_neg_sample()
        if self.train_mode == TrainMode.PAIR_WISE:
            self._prepare_train_neg_sample()

    def _load_next_state(self) -> None:
        from pytorchrec_tpu.data.process import generate_interaction_next_state_list

        gen = lambda: generate_interaction_next_state_list(
            self.dataset, self.max_next_state_len
        )
        self._register_mixed_array(
            (C.NEXT_STATE_DIR, C.POS_NEXT_STATE_NPY_TEMPLATE % self.max_next_state_len),
            C.POS_NEXT_STATE_LEN, C.POS_NEXT_STATE, gen,
        )
        if self.use_neg_next_state:
            self._register_mixed_array(
                (C.NEXT_STATE_DIR, C.NEG_NEXT_STATE_NPY_TEMPLATE % self.max_next_state_len),
                C.NEG_NEXT_STATE_LEN, C.NEG_NEXT_STATE, gen,
            )

    def _load_next_item_sample(self) -> None:
        from pytorchrec_tpu.data.process import generate_rl_next_item_sample

        path = self._dataset_path(C.RL_SAMPLE_DIR, C.RL_SAMPLE_NPY_TEMPLATE % self.rl_sample_len)
        if not os.path.exists(path):
            generate_rl_next_item_sample(self.dataset, self.rl_sample_len)
        rl_sample = np.load(path)
        assert rl_sample.shape[0] == len(self.interaction_df)
        self._aux_full[C.RL_SAMPLE] = rl_sample
        self.feature_column_dict[C.RL_SAMPLE] = CategoricalColumnWithIdentity(
            feature_name=C.RL_SAMPLE, category_num=0
        )
