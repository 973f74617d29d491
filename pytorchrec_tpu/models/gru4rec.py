"""GRU4Rec: session-based RNN ranker.

Capability parity with reference model/GRU4Rec.py:12-70, with the
sort/pack/unsort idiom replaced by the masked-scan GRU (see
pytorchrec_tpu/ops/gru.py — semantically identical, statically shaped).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target
from pytorchrec_tpu.ops import Embedding, MaskedGRU
from pytorchrec_tpu.ops.embedding import normal_init


class GRU4Rec(RecModel):
    iid_column: CategoricalColumnWithIdentity
    his_column: CategoricalColumnWithIdentity
    his_len_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    hidden_size: int = 64

    def setup(self):
        self.i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.rnn = MaskedGRU(hidden_size=self.hidden_size)
        self.out = nn.Dense(self.emb_size, use_bias=False, kernel_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        i_ids = self.iid_column.get_feature_data(batch)  # [B, N]
        his_ids = self.his_column.get_feature_data(batch)  # [B, S]
        his_len = self.his_len_column.get_feature_data(batch)  # [B]

        i_vectors = self.i_embeddings(i_ids)  # [B, N, E]
        his_vectors = self.i_embeddings(his_ids)  # [B, S, E]

        hidden = self.rnn(his_vectors, his_len)  # [B, H]
        rnn_vector = self.out(hidden)  # [B, E]

        prediction = jnp.sum(rnn_vector[:, None, :] * i_vectors, axis=-1)  # [B, N]
        return prediction, label_target(self.label_column, batch)
