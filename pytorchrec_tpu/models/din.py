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


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


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
    # round table rows up so they divide a mesh 'model' axis (explicit
    # sharded trainer; padding rows are never referenced)
    table_row_multiple: int = 1
    # item table as int8/int4 packed byte rows (q||scale||acc, one uint8
    # leaf — ops/quantized_packed.py). Train with QuantizedEmbeddingTrainer
    # (packed_tables=True) or ShardedSparseEmbeddingTrainer; the forward
    # dequantizes in-module when no trainer injects rows.
    quantized_table: bool = False
    # measured rowwise-Adagrad table lr (ABSOLUTE — RESULTS.md
    # round-4 quantized-quality table); consumed by
    # training/sparse_trainer.py::resolve_table_lr when the item
    # table runs a rowwise-style optimizer (VERDICT r4 #6)
    table_lr_hint: float = 2e-2
    table_bits: int = 8
    scale_col_groups: int = 1

    # sharded/sparse trainer injection keys: the ITEM table serves both the
    # [B, N] candidate gather and the [B, S] history gather — both flatten
    # through ONE exchange (VERDICT r3 #2), split back by position here
    U_ROWS_KEY = "__rows__din_u"
    I_ROWS_KEY = "__rows__din_i"

    def setup(self):
        m = self.table_row_multiple
        self.u_embeddings = Embedding(
            _round_up(self.uid_column.category_num, m), self.emb_size)
        if self.quantized_table:
            # the PRODUCTION-SCALE table (items — BASELINE 'DIN on Amazon')
            # as int8/int4 packed byte rows (ops/quantized_packed.py); the
            # small user table stays f32. Composes the build's fastest
            # table format with the sequence family.
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            self.i_q = self.param(
                "i_q",
                packed_table_init(self.emb_size, self.table_bits,
                                  self.scale_col_groups),
                (_round_up(self.iid_column.category_num, m),))
        else:
            self.i_embeddings = Embedding(
                _round_up(self.iid_column.category_num, m), self.emb_size)
        self.attention = DINAttentionPool(hidden_units=tuple(self.att_hidden_units))
        self.mlp = MLP(tuple(self.mlp_layers), activation="relu", dropout=self.dropout)
        self.head = nn.Dense(1, use_bias=False, kernel_init=normal_init)

    def _item_vectors(self, ids):
        """[ids..., E] f32 from the item table (f32 or quantized packed)."""
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import (
                packed_gather_dequant,
            )

            return packed_gather_dequant(self.i_q, ids, self.emb_size,
                                         self.table_bits,
                                         self.scale_col_groups)
        return self.i_embeddings(ids)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]
        his_ids = self.his_column.get_feature_data(batch)  # [B, S]
        valid_his = get_valid_his_index(his_ids)

        pointwise = i_ids.ndim == 1
        if pointwise:
            i_ids = i_ids[:, None]

        u_rows = batch.get(self.U_ROWS_KEY)
        i_rows = batch.get(self.I_ROWS_KEY)
        u_vectors = (jnp.reshape(u_rows, (*u_ids.shape, self.emb_size))
                     if u_rows is not None else self.u_embeddings(u_ids))
        if i_rows is not None:
            # one injected row block: candidates first, history after
            # (must match _item_gather_ids' concatenation order)
            rows = jnp.reshape(i_rows, (-1, self.emb_size))
            n_cand = i_ids.shape[0] * i_ids.shape[1]
            i_vectors = rows[:n_cand].reshape(*i_ids.shape, self.emb_size)
            his_vectors = rows[n_cand:].reshape(*his_ids.shape, self.emb_size)
        else:
            i_vectors = self._item_vectors(i_ids)  # [B, N, E]
            his_vectors = self._item_vectors(his_ids)  # [B, S, E]

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

    # --- sparse/sharded trainer protocols (same contracts as FunkSVD) ---

    def _item_gather_ids(self, batch: Batch) -> jnp.ndarray:
        """Candidate + history ids, flattened in the order __call__ splits
        the injected rows: [B*N candidates | B*S history]."""
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        if i_ids.ndim == 1:
            i_ids = i_ids[:, None]
        his_ids = jnp.asarray(self.his_column.get_feature_data(batch))
        return jnp.concatenate([i_ids.reshape(-1), his_ids.reshape(-1)])

    def sparse_table_ids(self, batch: Batch):
        """Sparse-trainer protocol (training/sparse_trainer.py): the big
        item table (the production-scale table — BASELINE 'DIN on Amazon')
        updates row-sparsely; history + candidate occurrences share it."""
        return {
            "u_embeddings/embedding": self.uid_column.get_feature_data(batch),
            "i_embeddings/embedding": self._item_gather_ids(batch),
        }

    def sharded_table_specs(self, batch: Batch):
        """Explicit sharded-table protocol
        (training/sharded_sparse_trainer.py). With ``quantized_table`` the
        item spec points at the packed byte-row leaf and carries the
        ``"quantized"`` block — int8 rows + scales ship on the exchange
        return hop, the owner shard updates byte rows in place (same
        machinery as the CTR family's ``unified_q``)."""
        i_spec = {"ids": self._item_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY}
        if self.quantized_table:
            i_spec["path"] = "i_q"
            i_spec["quantized"] = {"emb_size": self.emb_size,
                                   "bits": self.table_bits,
                                   "col_groups": self.scale_col_groups}
        else:
            i_spec["path"] = "i_embeddings/embedding"
        return {
            "u": {"path": "u_embeddings/embedding",
                  "ids": self.uid_column.get_feature_data(batch),
                  "rows_key": self.U_ROWS_KEY},
            "i": i_spec,
        }

    def quantized_table_spec(self, batch: Batch):
        """Quantized-trainer protocol (training/quantized_trainer.py,
        ``packed_tables=True``): the item table lazily updates over touched
        byte rows; the (small) user table + dense nets train dense-Adam."""
        assert self.quantized_table
        return {
            "i": {"q": "i_q", "scale": None,
                  "ids": self._item_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY, "bits": self.table_bits,
                  "col_groups": self.scale_col_groups, "packed": True,
                  "emb_size": self.emb_size},
        }
