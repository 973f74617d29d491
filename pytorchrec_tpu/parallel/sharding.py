"""Parameter sharding rules.

The build's answer to every ``torch.nn.Embedding`` row in the reference zoo
(SURVEY §2.10): embedding tables are row-sharded over the mesh's ``model``
axis, every dense parameter is replicated (data-parallel, gradients psum'd by
XLA). Rules are name-based over the param pytree — a table qualifies when its
path contains ``embedding`` and its row count divides evenly enough to split.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pytorchrec_tpu.parallel.mesh import MODEL_AXIS

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path).lower()


def is_embedding_table(path, leaf) -> bool:
    """Embedding tables: 2-D params under a module path containing
    'embedding'. The shared ops.Embedding module stores its table under
    '<name>/embedding' (pytorchrec_tpu/ops/embedding.py)."""
    return getattr(leaf, "ndim", 0) == 2 and "embedding" in _path_str(path)


def param_shardings(params: Any, mesh: Mesh, min_rows_to_shard: int = 0) -> Any:
    """NamedSharding pytree: tables row-sharded over ``model``, rest replicated.

    Tables whose row count is not divisible by the model-axis size (or smaller
    than ``min_rows_to_shard``) stay replicated — XLA would otherwise pad.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if (
            model_size > 1
            and is_embedding_table(path, leaf)
            and leaf.shape[0] >= max(min_rows_to_shard, model_size)
            and leaf.shape[0] % model_size == 0
        ):
            return NamedSharding(mesh, PartitionSpec(MODEL_AXIS, None))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh, **kwargs) -> Any:
    """Place a (host or device) param pytree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, **kwargs)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
