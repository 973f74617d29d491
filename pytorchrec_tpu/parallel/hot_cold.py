"""Frequency-aware hot/cold embedding placement (RecShard-style).

Real id traffic is Zipfian: a tiny fraction of rows serve most lookups
(RecShard, arXiv 2201.10095). Splitting a table by training-frequency —

* **hot** rows (top ``hot_rows`` by count): REPLICATED on every model-axis
  shard, served by a local gather, zero interconnect traffic;
* **cold** rows (the long tail): row-sharded over the ``model`` axis, served
  by the all-to-all exchange (parallel/embedding_engine.py) —

cuts exchange traffic by the hot-hit fraction (often >90% on Zipfian ids)
while the replicated memory cost stays tiny (hot_rows x E per shard).

Pure/differentiable throughout: gradients flow to both fragments
(hot grads sum locally per shard and must be psum'd by the caller's DP
reduction, exactly like any replicated parameter).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorchrec_tpu.parallel.embedding_engine import all_to_all_lookup
from pytorchrec_tpu.parallel.mesh import MODEL_AXIS


class HotColdLayout(NamedTuple):
    """Static layout: ``perm[v]`` maps original id -> packed id where packed
    ids ``< hot_rows`` live in the hot fragment and the rest (packed -
    hot_rows) index the cold fragment."""

    perm: np.ndarray       # [V] int32
    inverse: np.ndarray    # [V] int32, packed -> original
    hot_rows: int
    cold_rows: int


def build_layout(counts: np.ndarray, hot_rows: int,
                 pad_cold_to_multiple: int = 1) -> HotColdLayout:
    """Rank rows by training frequency; top ``hot_rows`` become hot.

    ``pad_cold_to_multiple``: round the cold fragment up so it divides the
    model axis (padding rows are never referenced).
    """
    v = len(counts)
    hot_rows = int(min(hot_rows, v))
    order = np.argsort(-np.asarray(counts), kind="stable")  # hottest first
    perm = np.empty(v, np.int32)
    perm[order] = np.arange(v, dtype=np.int32)
    cold = v - hot_rows
    if pad_cold_to_multiple > 1:
        cold = -(-cold // pad_cold_to_multiple) * pad_cold_to_multiple
    return HotColdLayout(perm=perm, inverse=order.astype(np.int32),
                         hot_rows=hot_rows, cold_rows=cold)


def split_table(table: np.ndarray, layout: HotColdLayout) -> Tuple[np.ndarray, np.ndarray]:
    """[V, E] -> (hot [H, E], cold [C, E]) in packed order (padded cold rows
    are zeros)."""
    v, e = table.shape
    packed = np.asarray(table)[layout.inverse]
    hot = packed[: layout.hot_rows]
    cold = np.zeros((layout.cold_rows, e), table.dtype)
    cold[: v - layout.hot_rows] = packed[layout.hot_rows :]
    return hot, cold


def merge_table(hot: np.ndarray, cold: np.ndarray,
                layout: HotColdLayout) -> np.ndarray:
    """Inverse of ``split_table``: (hot [H, E], cold [C, E]) -> [V, E] in the
    original row order (drops cold padding) — for checkpointing or exporting
    a table trained in the hot/cold layout."""
    v = len(layout.perm)
    packed = np.concatenate(
        [np.asarray(hot), np.asarray(cold)[: v - layout.hot_rows]])
    return packed[layout.perm]


def hot_cold_lookup(hot: jnp.ndarray, cold_shard: jnp.ndarray,
                    perm: jnp.ndarray, ids: jnp.ndarray,
                    axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Per-shard body (use inside shard_map): hot ids resolve locally, cold
    ids ride the all-to-all exchange.

    ``hot [H, E]`` replicated; ``cold_shard [C/m, E]``; ``perm [V]``
    replicated; ``ids [B]`` (this shard's batch rows).
    """
    hot_rows = hot.shape[0]
    packed = perm[ids]
    is_hot = packed < hot_rows
    hot_vectors = hot[jnp.clip(packed, 0, hot_rows - 1)]
    # hot ids are routed as cold id 0 with the result masked out — the
    # exchange stays static-shape, the hot fraction just carries dead slots
    cold_ids = jnp.where(is_hot, 0, packed - hot_rows)
    cold_vectors = all_to_all_lookup(cold_shard, cold_ids, axis_name)
    return jnp.where(is_hot[:, None], hot_vectors, cold_vectors)


def make_hot_cold_lookup(mesh):
    """Jitted full-array convenience: (hot [H,E] replicated, cold [C,E]
    row-sharded, perm [V], ids [B] data-sharded) -> [B, E]."""
    from functools import partial

    from jax.sharding import PartitionSpec

    from pytorchrec_tpu.parallel.mesh import DATA_AXIS

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(MODEL_AXIS, None),
                  PartitionSpec(), PartitionSpec(DATA_AXIS)),
        out_specs=PartitionSpec(DATA_AXIS, None),
        check_vma=False,
    )
    def lookup(hot, cold_shard, perm, ids_local):
        return hot_cold_lookup(hot, cold_shard, perm, ids_local, MODEL_AXIS)

    return jax.jit(lookup)
