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
    # round item-table rows so they divide a mesh 'model' axis
    table_row_multiple: int = 1
    # item table as int8/int4 packed byte rows (same contracts as DIN)
    quantized_table: bool = False
    # measured rowwise-Adagrad table lr (ABSOLUTE — RESULTS.md
    # round-4 quantized-quality table); consumed by
    # training/sparse_trainer.py::resolve_table_lr when the item
    # table runs a rowwise-style optimizer (VERDICT r4 #6)
    table_lr_hint: float = 2e-2
    table_bits: int = 8
    scale_col_groups: int = 1

    # sharded/sparse injection: candidates + history share the item table,
    # one flattened gather [B*N | B*S] (split back by position below)
    I_ROWS_KEY = "__rows__gru4rec_i"

    def setup(self):
        m = self.table_row_multiple
        rows = -(-self.iid_column.category_num // m) * m
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            self.i_q = self.param(
                "i_q",
                packed_table_init(self.emb_size, self.table_bits,
                                  self.scale_col_groups),
                (rows,))
        else:
            self.i_embeddings = Embedding(rows, self.emb_size)
        self.rnn = MaskedGRU(hidden_size=self.hidden_size)
        self.out = nn.Dense(self.emb_size, use_bias=False, kernel_init=normal_init)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        i_ids = self.iid_column.get_feature_data(batch)  # [B, N]
        his_ids = self.his_column.get_feature_data(batch)  # [B, S]
        his_len = self.his_len_column.get_feature_data(batch)  # [B]

        # point-wise rows arrive [B]; expand to one candidate (the bare
        # [B, E] broadcast would silently produce a [B, B] prediction)
        pointwise = i_ids.ndim == 1
        if pointwise:
            i_ids = i_ids[:, None]

        i_rows = batch.get(self.I_ROWS_KEY)
        if i_rows is not None:
            rows = jnp.reshape(i_rows, (-1, self.emb_size))
            n_cand = i_ids.shape[0] * i_ids.shape[1]
            i_vectors = rows[:n_cand].reshape(*i_ids.shape, self.emb_size)
            his_vectors = rows[n_cand:].reshape(*his_ids.shape, self.emb_size)
        else:
            i_vectors = self._item_vectors(i_ids)  # [B, N, E]
            his_vectors = self._item_vectors(his_ids)  # [B, S, E]

        hidden = self.rnn(his_vectors, his_len)  # [B, H]
        rnn_vector = self.out(hidden)  # [B, E]

        prediction = jnp.sum(rnn_vector[:, None, :] * i_vectors, axis=-1)  # [B, N]
        if pointwise:
            prediction = prediction[:, 0]
        return prediction, label_target(self.label_column, batch)

    # --- sparse/sharded trainer protocols (same contracts as FunkSVD) ---

    def _item_vectors(self, ids):
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import (
                packed_gather_dequant,
            )

            return packed_gather_dequant(self.i_q, ids, self.emb_size,
                                         self.table_bits,
                                         self.scale_col_groups)
        return self.i_embeddings(ids)

    def _item_gather_ids(self, batch: Batch) -> jnp.ndarray:
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        if i_ids.ndim == 1:
            i_ids = i_ids[:, None]
        his_ids = jnp.asarray(self.his_column.get_feature_data(batch))
        return jnp.concatenate([i_ids.reshape(-1), his_ids.reshape(-1)])

    def sparse_table_ids(self, batch: Batch):
        return {"i_embeddings/embedding": self._item_gather_ids(batch)}

    def sharded_table_specs(self, batch: Batch):
        i_spec = {"ids": self._item_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY}
        if self.quantized_table:
            i_spec["path"] = "i_q"
            i_spec["quantized"] = {"emb_size": self.emb_size,
                                   "bits": self.table_bits,
                                   "col_groups": self.scale_col_groups}
        else:
            i_spec["path"] = "i_embeddings/embedding"
        return {"i": i_spec}

    def quantized_table_spec(self, batch: Batch):
        """Quantized-trainer protocol (training/quantized_trainer.py)."""
        assert self.quantized_table
        return {
            "i": {"q": "i_q", "scale": None,
                  "ids": self._item_gather_ids(batch),
                  "rows_key": self.I_ROWS_KEY, "bits": self.table_bits,
                  "col_groups": self.scale_col_groups, "packed": True,
                  "emb_size": self.emb_size},
        }
