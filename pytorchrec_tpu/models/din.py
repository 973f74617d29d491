"""DIN: Deep Interest Network — attention pooling over behavior sequences.

No reference-model counterpart (required config per BASELINE.json: "DIN on
Amazon-Electronics, varlen behavior sequences, attention pooling, NDCG").
Consumes the same history layout the reference's HistoryDataReader produces
(pos_his / pos_his_len columns, data/HistoryDataReader.py:55-69).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target, one_hot_first_target
from pytorchrec_tpu.ops import Embedding, get_valid_his_index
from pytorchrec_tpu.ops.attention import DINAttentionPool
from pytorchrec_tpu.ops.embedding import normal_init
from pytorchrec_tpu.ops.mlp import MLP


class DIN(RecModel):
    uid_column: CategoricalColumnWithIdentity
    iid_column: CategoricalColumnWithIdentity
    his_column: CategoricalColumnWithIdentity
    his_len_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 32
    att_hidden_units: Sequence[int] = (80, 40)
    mlp_layers: Sequence[int] = (200, 80)
    dropout: float = 0.0

    def setup(self):
        self.u_embeddings = Embedding(self.uid_column.category_num, self.emb_size)
        self.i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.attention = DINAttentionPool(hidden_units=tuple(self.att_hidden_units))
        self.mlp = MLP(tuple(self.mlp_layers), activation="relu", dropout=self.dropout)
        self.head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]
        his_ids = self.his_column.get_feature_data(batch)  # [B, S]
        valid_his = get_valid_his_index(his_ids)

        pointwise = i_ids.ndim == 1
        if pointwise:
            i_ids = i_ids[:, None]

        u_vectors = self.u_embeddings(u_ids)  # [B, E]
        i_vectors = self.i_embeddings(i_ids)  # [B, N, E]
        his_vectors = self.i_embeddings(his_ids)  # [B, S, E]

        interest = self.attention(his_vectors, i_vectors, valid_his, train=train)  # [B, N, E]

        n = i_ids.shape[1]
        u_b = jnp.broadcast_to(u_vectors[:, None, :], interest.shape)
        feats = jnp.concatenate(
            [u_b, interest, i_vectors, interest * i_vectors], axis=-1
        )  # [B, N, 4E]
        prediction = self.head(self.mlp(feats, train=train))[..., 0]  # [B, N]

        if pointwise:
            return prediction[:, 0], label_target(self.label_column, batch)
        return prediction, one_hot_first_target(prediction)
