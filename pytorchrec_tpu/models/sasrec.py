"""SASRec: self-attentive sequential recommender.

Capability parity with reference model/SASRec.py:34-118: item + reverse
position embeddings, N blocks of (self-attn -> W1/W2 FFN -> dropout ->
residual -> LayerNorm), masked mean-pool, dot-product scoring. The attention
math (including the global max-subtraction quirk) lives in
pytorchrec_tpu/ops/attention.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
from pytorchrec_tpu.models.base import Batch, Prediction, RecModel, label_target
from pytorchrec_tpu.ops import Embedding, get_position_ids, get_valid_his_index
from pytorchrec_tpu.ops.attention import SASRecBlock, sasrec_encoder


class SASRec(RecModel):
    iid_column: CategoricalColumnWithIdentity
    his_column: CategoricalColumnWithIdentity
    his_len_column: CategoricalColumnWithIdentity
    label_column: CategoricalColumnWithIdentity
    emb_size: int = 64
    max_his_len: int = 10
    num_layers: int = 1
    dropout: float = 0.2
    # the reference reuses ONE Q/K/W1/W2/LayerNorm across all layers
    # (SASRec.py:66-107: single modules applied in the layer loop); set
    # False for the conventional per-layer parameterization
    share_layer_weights: bool = True

    def setup(self):
        self.i_embeddings = Embedding(self.iid_column.category_num, self.emb_size)
        self.p_embeddings = Embedding(self.max_his_len + 1, self.emb_size)
        if self.share_layer_weights:
            shared = SASRecBlock(emb_size=self.emb_size, dropout=self.dropout,
                                 name="block_shared")
            self.blocks = [shared] * self.num_layers
        else:
            self.blocks = [
                SASRecBlock(emb_size=self.emb_size, dropout=self.dropout,
                            name=f"block_{i}")
                for i in range(self.num_layers)
            ]

    def __call__(self, batch: Batch, train: bool = False) -> Prediction:
        i_ids = self.iid_column.get_feature_data(batch)  # [B, N]
        his_ids = self.his_column.get_feature_data(batch)  # [B, S]
        his_len = self.his_len_column.get_feature_data(batch)  # [B]

        valid_his = get_valid_his_index(his_ids)  # [B, S]

        i_vectors = self.i_embeddings(i_ids)  # [B, N, E]
        his_vectors = self.i_embeddings(his_ids)  # [B, S, E]

        pos_ids = get_position_ids(valid_his, his_len)  # [B, S]
        his_vectors = his_vectors + self.p_embeddings(pos_ids)

        his_vector = sasrec_encoder(his_vectors, valid_his, his_len, self.blocks, train=train)

        prediction = jnp.sum(his_vector[:, None, :] * i_vectors, axis=-1)  # [B, N]
        return prediction, label_target(self.label_column, batch)
