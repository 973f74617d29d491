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


class FunkSVD(RecModel):
    uid_column: CategoricalColumnWithIdentity
    iid_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64

    def setup(self):
        self.u_embeddings = Embedding(self.uid_column.category_num, self.emb_size)
        self.i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        u_ids = self.uid_column.get_feature_data(batch)  # [B]
        i_ids = self.iid_column.get_feature_data(batch)  # [B] or [B, N]

        u_vectors = self.u_embeddings(u_ids)  # [B, E]
        i_vectors = self.i_embeddings(i_ids)  # [B, E] or [B, N, E]

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
