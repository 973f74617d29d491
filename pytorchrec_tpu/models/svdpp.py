"""SVD++: MF + user/item/global biases + implicit-feedback vector.

Capability parity with reference model/SVDPP.py:13-91: the implicit history
mean is masked by ``iid > 0`` and scaled by ``1/sqrt(len)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target, one_hot_first_target
from pytorchrec_tpu.ops import Embedding


class SVDPP(RecModel):
    uid_column: CategoricalColumnWithIdentity
    iid_column: CategoricalColumnWithIdentity
    iids_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    # round table rows so they divide a mesh 'model' axis
    table_row_multiple: int = 1
    # item + implicit-feedback item tables as int8/int4 packed byte rows
    # (same contracts as DIN); user table + biases stay f32
    quantized_table: bool = False
    table_bits: int = 8
    scale_col_groups: int = 1

    # sharded/sparse injection keys (FunkSVD-style protocol); the implicit
    # table's [B, H] history gather rides its own exchange
    U_ROWS_KEY = "__rows__svdpp_u"
    I_ROWS_KEY = "__rows__svdpp_i"
    IMP_ROWS_KEY = "__rows__svdpp_imp"
    UB_ROWS_KEY = "__rows__svdpp_ub"
    IB_ROWS_KEY = "__rows__svdpp_ib"

    def setup(self):
        m = self.table_row_multiple
        nu = -(-self.uid_column.category_num // m) * m
        ni = -(-self.iid_column.category_num // m) * m
        self.u_embeddings = Embedding(nu, self.emb_size)
        if self.quantized_table:
            from pytorchrec_tpu.ops.quantized_packed import packed_table_init

            init = packed_table_init(self.emb_size, self.table_bits,
                                     self.scale_col_groups)
            self.i_q = self.param("i_q", init, (ni,))
            self.implicit_i_q = self.param("implicit_i_q", init, (ni,))
        else:
            self.i_embeddings = Embedding(ni, self.emb_size)
            self.implicit_i_embeddings = Embedding(ni, self.emb_size)
        self.u_bias = Embedding(nu, 1)
        self.i_bias = Embedding(ni, 1)
        # scalar global bias initialized to 0 (reference SVDPP.py:42)
        self.global_bias = self.param(
            "global_bias", lambda key, shape: jnp.zeros(shape, jnp.float32), ()
        )

    def _rows_or_gather(self, batch, key, table, ids, width):
        rows = batch.get(key)
        if rows is not None:
            return jnp.reshape(rows, (*jnp.asarray(ids).shape, width))
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
        implicit_i_ids = self.iids_column.get_feature_data(batch)  # [B, H]

        global_bias = self.global_bias

        valid = (implicit_i_ids > 0).astype(jnp.float32)  # [B, H]
        implicit = self._rows_or_gather(
            batch, self.IMP_ROWS_KEY,
            "implicit_i_q" if self.quantized_table
            else self.implicit_i_embeddings,
            implicit_i_ids, self.emb_size)  # [B, H, E]
        implicit = jnp.sum(implicit * valid[..., None], axis=1)  # [B, E]
        implicit = implicit / jnp.sqrt(jnp.sum(valid, axis=-1))[:, None]

        u_vectors = self._rows_or_gather(
            batch, self.U_ROWS_KEY, self.u_embeddings, u_ids, self.emb_size)
        i_vectors = self._rows_or_gather(
            batch, self.I_ROWS_KEY,
            "i_q" if self.quantized_table else self.i_embeddings,
            i_ids, self.emb_size)
        u_bias = self._rows_or_gather(
            batch, self.UB_ROWS_KEY, self.u_bias, u_ids, 1)[..., 0]  # [B]
        i_bias = self._rows_or_gather(
            batch, self.IB_ROWS_KEY, self.i_bias, i_ids, 1)[..., 0]

        if i_ids.ndim == 1:
            prediction = (
                jnp.sum((u_vectors + implicit) * i_vectors, axis=-1)
                + u_bias + i_bias + global_bias
            )
            return prediction, label_target(self.label_column, batch)

        user_side = (u_vectors + implicit)[:, None, :]  # [B, 1, E]
        prediction = (
            jnp.sum(user_side * i_vectors, axis=-1) + u_bias[:, None] + i_bias + global_bias
        )
        return prediction, one_hot_first_target(prediction)

    # --- sparse/sharded trainer protocols (same contracts as FunkSVD) ---

    def sparse_table_ids(self, batch: Batch):
        u_ids = self.uid_column.get_feature_data(batch)
        i_ids = self.iid_column.get_feature_data(batch)
        imp = self.iids_column.get_feature_data(batch)
        return {
            "u_embeddings/embedding": u_ids,
            "i_embeddings/embedding": i_ids,
            "implicit_i_embeddings/embedding": imp,
            "u_bias/embedding": u_ids,
            "i_bias/embedding": i_ids,
        }

    def sharded_table_specs(self, batch: Batch):
        u_ids = self.uid_column.get_feature_data(batch)
        i_ids = self.iid_column.get_feature_data(batch)
        imp = self.iids_column.get_feature_data(batch)
        specs = {
            "u": {"path": "u_embeddings/embedding", "ids": u_ids,
                  "rows_key": self.U_ROWS_KEY},
            "i": {"path": "i_embeddings/embedding", "ids": i_ids,
                  "rows_key": self.I_ROWS_KEY},
            "imp": {"path": "implicit_i_embeddings/embedding", "ids": imp,
                    "rows_key": self.IMP_ROWS_KEY},
            "ub": {"path": "u_bias/embedding", "ids": u_ids,
                   "rows_key": self.UB_ROWS_KEY},
            "ib": {"path": "i_bias/embedding", "ids": i_ids,
                   "rows_key": self.IB_ROWS_KEY},
        }
        if self.quantized_table:
            qblock = {"emb_size": self.emb_size, "bits": self.table_bits,
                      "col_groups": self.scale_col_groups}
            specs["i"]["path"] = "i_q"
            specs["i"]["quantized"] = dict(qblock)
            specs["imp"]["path"] = "implicit_i_q"
            specs["imp"]["quantized"] = dict(qblock)
        return specs

    def quantized_table_spec(self, batch: Batch):
        """Quantized-trainer protocol (training/quantized_trainer.py)."""
        assert self.quantized_table
        i_ids = jnp.asarray(self.iid_column.get_feature_data(batch))
        imp = jnp.asarray(self.iids_column.get_feature_data(batch))
        common = {"scale": None, "bits": self.table_bits,
                  "col_groups": self.scale_col_groups, "packed": True,
                  "emb_size": self.emb_size}
        return {
            "i": {"q": "i_q", "ids": i_ids,
                  "rows_key": self.I_ROWS_KEY, **common},
            "imp": {"q": "implicit_i_q", "ids": imp,
                    "rows_key": self.IMP_ROWS_KEY, **common},
        }
