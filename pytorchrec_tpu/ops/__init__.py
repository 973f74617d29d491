from pytorchrec_tpu.ops.embedding import Embedding, normal_init
from pytorchrec_tpu.ops.mlp import MLP, Dense
from pytorchrec_tpu.ops.gru import MaskedGRU
from pytorchrec_tpu.ops.attention import (
    din_attention_pool,
    sasrec_encoder,
    scaled_dot_product_attention,
)
from pytorchrec_tpu.ops.interactions import cross_layer_v2, fm_interaction
from pytorchrec_tpu.ops.seq_utils import get_position_ids, get_valid_his_index

__all__ = [
    "Embedding",
    "normal_init",
    "Dense",
    "MLP",
    "MaskedGRU",
    "scaled_dot_product_attention",
    "sasrec_encoder",
    "din_attention_pool",
    "fm_interaction",
    "cross_layer_v2",
    "get_valid_his_index",
    "get_position_ids",
]
