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
    # round table rows so they divide a mesh 'model' axis
    table_row_multiple: int = 1

    # sharded/sparse injection keys: user rows gather once per ROW ([B]) and
    # broadcast over candidates (same values the reference's broadcast
    # gather produces, at 1/N the row passes); item rows gather [B, N]
    MF_U_ROWS_KEY = "__rows__ncf_mf_u"
    MF_I_ROWS_KEY = "__rows__ncf_mf_i"
    MLP_U_ROWS_KEY = "__rows__ncf_mlp_u"
    MLP_I_ROWS_KEY = "__rows__ncf_mlp_i"

    def setup(self):
        m = self.table_row_multiple
        nu = -(-self.uid_column.category_num // m) * m
        ni = -(-self.iid_column.category_num // m) * m
        self.mf_u_embeddings = Embedding(nu, self.emb_size)
        self.mf_i_embeddings = Embedding(ni, self.emb_size)
        self.mlp_u_embeddings = Embedding(nu, self.emb_size)
        self.mlp_i_embeddings = Embedding(ni, self.emb_size)
        self.mlp = MLP(tuple(self.layers), activation="relu", dropout=self.dropout)
        self.prediction_head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def _vectors(self, batch, key, table, ids):
        rows = batch.get(key)
        if rows is not None:
            return jnp.reshape(rows, (*ids.shape, self.emb_size))
        return table(ids)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]

        pointwise = i_ids.ndim == 1
        if pointwise:
            i_ids = i_ids[:, None]  # [B, 1]

        # user rows gather [B] once, broadcast over the N candidates
        mf_u = self._vectors(batch, self.MF_U_ROWS_KEY,
                             self.mf_u_embeddings, u_ids)[:, None, :]
        mlp_u = self._vectors(batch, self.MLP_U_ROWS_KEY,
                              self.mlp_u_embeddings, u_ids)[:, None, :]
        mf_i = self._vectors(batch, self.MF_I_ROWS_KEY,
                             self.mf_i_embeddings, i_ids)
        mlp_i = self._vectors(batch, self.MLP_I_ROWS_KEY,
                              self.mlp_i_embeddings, i_ids)

        mf_vector = mf_u * mf_i  # [B, N, E]
        mlp_vector = jnp.concatenate(
            [jnp.broadcast_to(mlp_u, mlp_i.shape), mlp_i], axis=-1
        )  # [B, N, 2E]
        mlp_vector = self.mlp(mlp_vector, train=train)  # [B, N, layers[-1]]

        output_vector = jnp.concatenate([mf_vector, mlp_vector], axis=-1)
        prediction = self.prediction_head(output_vector)[..., 0]  # [B, N]

        if pointwise:
            return prediction[:, 0], label_target(self.label_column, batch)
        return prediction, one_hot_first_target(prediction)

    # --- sparse/sharded trainer protocols (same contracts as FunkSVD) ---

    def sparse_table_ids(self, batch: Batch):
        u_ids = self.uid_column.get_feature_data(batch)
        i_ids = self.iid_column.get_feature_data(batch)
        return {
            "mf_u_embeddings/embedding": u_ids,
            "mlp_u_embeddings/embedding": u_ids,
            "mf_i_embeddings/embedding": i_ids,
            "mlp_i_embeddings/embedding": i_ids,
        }

    def sharded_table_specs(self, batch: Batch):
        u_ids = self.uid_column.get_feature_data(batch)
        i_ids = self.iid_column.get_feature_data(batch)
        return {
            "mf_u": {"path": "mf_u_embeddings/embedding", "ids": u_ids,
                     "rows_key": self.MF_U_ROWS_KEY},
            "mlp_u": {"path": "mlp_u_embeddings/embedding", "ids": u_ids,
                      "rows_key": self.MLP_U_ROWS_KEY},
            "mf_i": {"path": "mf_i_embeddings/embedding", "ids": i_ids,
                     "rows_key": self.MF_I_ROWS_KEY},
            "mlp_i": {"path": "mlp_i_embeddings/embedding", "ids": i_ids,
                      "rows_key": self.MLP_I_ROWS_KEY},
        }
