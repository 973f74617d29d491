"""FunkSVD: plain matrix factorization, dot(user, item).

Capability parity with reference model/FunkSVD.py:12-67. The candidate-mode
broadcast uses jnp broadcasting instead of the reference's
unsqueeze/repeat/reshape round trip (FunkSVD.py:57-62) — same math, no copies.
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target, one_hot_first_target
from pytorchrec_tpu.ops import Embedding


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


class FunkSVD(RecModel):
    uid_column: CategoricalColumnWithIdentity
    iid_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    # round table rows up so they divide a mesh 'model' axis (the explicit
    # sharded-embedding trainer requires equal row shards; padding rows are
    # never referenced — ids stay < category_num)
    table_row_multiple: int = 1
    # item table as int8/int4 packed byte rows (same contracts as DIN)
    quantized_table: bool = False
    table_bits: int = 8
    scale_col_groups: int = 1

    # batch keys carrying externally-gathered rows (the explicit sharded
    # trainer injects these; the in-module gather is then skipped so
    # d(loss)/d(rows) is the per-occurrence row gradient)
    U_ROWS_KEY = "__rows__u"
    I_ROWS_KEY = "__rows__i"

    def setup(self):
        m = self.table_row_multiple
        self.u_embeddings = Embedding(
            _round_up(self.uid_column.category_num, m), self.emb_size)
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            self.i_q = self.param(
                "i_q",
                packed_table_init(self.emb_size, self.table_bits,
                                  self.scale_col_groups),
                (_round_up(self.iid_column.category_num, m),))
        else:
            self.i_embeddings = Embedding(
                _round_up(self.iid_column.category_num, m), self.emb_size)

    def _item_vectors(self, ids):
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

        u_rows = batch.get(self.U_ROWS_KEY)
        i_rows = batch.get(self.I_ROWS_KEY)
        u_vectors = (jnp.reshape(u_rows, (*u_ids.shape, self.emb_size))
                     if u_rows is not None else self.u_embeddings(u_ids))
        i_vectors = (jnp.reshape(i_rows, (*i_ids.shape, self.emb_size))
                     if i_rows is not None else self._item_vectors(i_ids))

        if i_ids.ndim == 1:
            prediction = jnp.sum(u_vectors * i_vectors, axis=-1)  # [B]
            return prediction, label_target(self.label_column, batch)

        prediction = jnp.sum(u_vectors[:, None, :] * i_vectors, axis=-1)  # [B, N]
        return prediction, one_hot_first_target(prediction)

    def sparse_table_ids(self, batch: Batch):
        """Sparse-trainer protocol (training/sparse_trainer.py)."""
        return {
            "u_embeddings/embedding": self.uid_column.get_feature_data(batch),
            "i_embeddings/embedding": self.iid_column.get_feature_data(batch),
        }

    def sharded_table_specs(self, batch: Batch):
        """Explicit sharded-table protocol
        (training/sharded_sparse_trainer.py): per table, the ids at every
        gather position plus the batch key where externally-gathered rows are
        injected back."""
        i_spec = {"ids": self.iid_column.get_feature_data(batch),
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
        """Quantized-trainer protocol (training/quantized_trainer.py)."""
        assert self.quantized_table
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        return {
            "i": {"q": "i_q", "scale": None, "ids": i_ids,
                  "rows_key": self.I_ROWS_KEY, "bits": self.table_bits,
                  "col_groups": self.scale_col_groups, "packed": True,
                  "emb_size": self.emb_size},
        }
