from pytorchrec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
)
from pytorchrec_tpu.parallel.sharding import (
    is_embedding_table,
    param_shardings,
    shard_params,
)
from pytorchrec_tpu.parallel.embedding_engine import (
    all_to_all_lookup,
    all_to_all_rowgrad,
    bucket_capacity,
    grid_lookup,
    grid_rowgrad,
    two_hop_lookup,
    two_hop_rowgrad,
    make_sharded_lookup,
    masked_psum_lookup,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "data_sharding",
    "replicated",
    "initialize_distributed",
    "param_shardings",
    "shard_params",
    "is_embedding_table",
    "masked_psum_lookup",
    "all_to_all_lookup",
    "all_to_all_rowgrad",
    "bucket_capacity",
    "grid_lookup",
    "grid_rowgrad",
    "two_hop_lookup",
    "two_hop_rowgrad",
    "make_sharded_lookup",
]

from pytorchrec_tpu.parallel.hot_cold import (
    HotColdLayout,
    build_layout,
    hot_cold_lookup,
    make_hot_cold_lookup,
    merge_table,
    split_table,
)

__all__ += [
    "HotColdLayout",
    "build_layout",
    "split_table",
    "hot_cold_lookup",
    "make_hot_cold_lookup",
    "merge_table",
]
