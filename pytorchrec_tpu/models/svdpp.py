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

    def setup(self):
        self.u_embeddings = Embedding(self.uid_column.category_num, self.emb_size)
        self.i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.implicit_i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.u_bias = Embedding(self.uid_column.category_num, 1)
        self.i_bias = Embedding(self.iid_column.category_num, 1)
        # scalar global bias initialized to 0 (reference SVDPP.py:42)
        self.global_bias = self.param(
            "global_bias", lambda key, shape: jnp.zeros(shape, jnp.float32), ()
        )

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]
        implicit_i_ids = self.iids_column.get_feature_data(batch)  # [B, H]

        global_bias = self.global_bias

        valid = (implicit_i_ids > 0).astype(jnp.float32)  # [B, H]
        implicit = self.implicit_i_embeddings(implicit_i_ids)  # [B, H, E]
        implicit = jnp.sum(implicit * valid[..., None], axis=1)  # [B, E]
        implicit = implicit / jnp.sqrt(jnp.sum(valid, axis=-1))[:, None]

        u_vectors = self.u_embeddings(u_ids)  # [B, E]
        i_vectors = self.i_embeddings(i_ids)  # [B, E] or [B, N, E]
        u_bias = self.u_bias(u_ids)[..., 0]  # [B]
        i_bias = self.i_bias(i_ids)[..., 0]  # [B] or [B, N]

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
