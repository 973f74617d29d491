"""NCF (NeuMF): GMF elementwise product ⊕ MLP tower, fused linear head.

Capability parity with reference model/NCF.py:13-79 (separate MF and MLP
embedding pairs; candidates flattened through the tower then reshaped).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import (
    Batch,
    Prediction,
    RecModel,
    label_target,
    one_hot_first_target,
)
from pytorchrec_tpu.ops import MLP, Embedding
from pytorchrec_tpu.ops.embedding import normal_init

import flax.linen as nn


class NCF(RecModel):
    uid_column: CategoricalColumnWithIdentity
    iid_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    layers: Sequence[int] = (64,)
    dropout: float = 0.2

    def setup(self):
        self.mf_u_embeddings = Embedding(self.uid_column.category_num, self.emb_size)
        self.mf_i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.mlp_u_embeddings = Embedding(self.uid_column.category_num, self.emb_size)
        self.mlp_i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.mlp = MLP(tuple(self.layers), activation="relu", dropout=self.dropout)
        self.prediction_head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]

        pointwise = i_ids.ndim == 1
        if pointwise:
            i_ids = i_ids[:, None]  # [B, 1]
        u_ids = jnp.broadcast_to(u_ids[:, None], i_ids.shape)  # [B, N]

        mf_vector = self.mf_u_embeddings(u_ids) * self.mf_i_embeddings(i_ids)  # [B, N, E]
        mlp_vector = jnp.concatenate(
            [self.mlp_u_embeddings(u_ids), self.mlp_i_embeddings(i_ids)], axis=-1
        )  # [B, N, 2E]
        mlp_vector = self.mlp(mlp_vector, train=train)  # [B, N, layers[-1]]

        output_vector = jnp.concatenate([mf_vector, mlp_vector], axis=-1)
        prediction = self.prediction_head(output_vector)[..., 0]  # [B, N]

        if pointwise:
            return prediction[:, 0], label_target(self.label_column, batch)
        return prediction, one_hot_first_target(prediction)
