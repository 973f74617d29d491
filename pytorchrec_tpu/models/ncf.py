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
    # BOTH item tables (GMF + MLP) as int8/int4 packed byte rows (same
    # contracts as DIN); user tables stay f32
    quantized_table: bool = False
    table_bits: int = 8
    scale_col_groups: int = 1

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
        self.mlp_u_embeddings = Embedding(nu, self.emb_size)
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            init = packed_table_init(self.emb_size, self.table_bits,
                                     self.scale_col_groups)
            self.mf_i_q = self.param("mf_i_q", init, (ni,))
            self.mlp_i_q = self.param("mlp_i_q", init, (ni,))
        else:
            self.mf_i_embeddings = Embedding(ni, self.emb_size)
            self.mlp_i_embeddings = Embedding(ni, self.emb_size)
        self.mlp = MLP(tuple(self.layers), activation="relu", dropout=self.dropout)
        self.prediction_head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def _vectors(self, batch, key, table, ids):
        rows = batch.get(key)
        if rows is not None:
            return jnp.reshape(rows, (*ids.shape, self.emb_size))
        if isinstance(table, str):  # quantized packed leaf attribute name
            from pytorchrec_tpu.ops.quantized_packed import (
                packed_gather_dequant,
            )

            return packed_gather_dequant(getattr(self, table), ids,
                                         self.emb_size, self.table_bits,
                                         self.scale_col_groups)
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
        mf_i = self._vectors(
            batch, self.MF_I_ROWS_KEY,
            "mf_i_q" if self.quantized_table else self.mf_i_embeddings, i_ids)
        mlp_i = self._vectors(
            batch, self.MLP_I_ROWS_KEY,
            "mlp_i_q" if self.quantized_table else self.mlp_i_embeddings,
            i_ids)

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
        specs = {
            "mf_u": {"path": "mf_u_embeddings/embedding", "ids": u_ids,
                     "rows_key": self.MF_U_ROWS_KEY},
            "mlp_u": {"path": "mlp_u_embeddings/embedding", "ids": u_ids,
                      "rows_key": self.MLP_U_ROWS_KEY},
            "mf_i": {"path": "mf_i_embeddings/embedding", "ids": i_ids,
                     "rows_key": self.MF_I_ROWS_KEY},
            "mlp_i": {"path": "mlp_i_embeddings/embedding", "ids": i_ids,
                      "rows_key": self.MLP_I_ROWS_KEY},
        }
        if self.quantized_table:
            qblock = {"emb_size": self.emb_size, "bits": self.table_bits,
                      "col_groups": self.scale_col_groups}
            specs["mf_i"]["path"] = "mf_i_q"
            specs["mf_i"]["quantized"] = dict(qblock)
            specs["mlp_i"]["path"] = "mlp_i_q"
            specs["mlp_i"]["quantized"] = dict(qblock)
        return specs

    def quantized_table_spec(self, batch: Batch):
        """Quantized-trainer protocol (training/quantized_trainer.py)."""
        assert self.quantized_table
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        common = {"scale": None, "ids": i_ids, "bits": self.table_bits,
                  "col_groups": self.scale_col_groups, "packed": True,
                  "emb_size": self.emb_size}
        return {
            "mf_i": {"q": "mf_i_q", "rows_key": self.MF_I_ROWS_KEY, **common},
            "mlp_i": {"q": "mlp_i_q", "rows_key": self.MLP_I_ROWS_KEY,
                      **common},
        }
